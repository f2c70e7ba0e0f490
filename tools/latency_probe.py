#!/usr/bin/env python
"""Spark job-scheduling latency probe (VERDICT r10 #2 diagnosis aid).

The round-10/11 bench investigation found per-key timings split into two
populations: scan-bound keys reproduce their historical numbers while
job-count-heavy iterative keys (x_lpa, x_kcore — dozens of tiny stages
per fixpoint round) run 1.5–2.5× slower on the same code and plans.
That asymmetry is the signature of PER-JOB OVERHEAD (driver scheduling,
thread wakeup, task serialization round-trips), which multiplies across
a job-count-heavy key and vanishes inside a single long scan.

This probe measures that overhead directly, so "environment noise"
claims become a trackable number instead of an inference:

- 1-task job round-trip (pure scheduling floor)
- 32-task job round-trip (task fan-out cost at local[32])
- 2-stage shuffle job (stage boundary + exchange cost)

Run it at round start on a quiet box and record the numbers in SCALE.md
next to the bench totals.  The round-11 first-cut probe had two
measurement flaws fixed in-round (bare range(1) defaulted to 32
partitions; repartition(32) added a shuffle to the fan-out probe) —
corrected reference points, round 11 quiet box (kernel 6.18.5-fc-v20,
OpenJDK 17.0.20, local[32]): see SCALE.md §7q.  Absolute levels drift
with residual host load; treat the probe as a same-moment companion to
a bench run, not a constant of the box.

Usage: python tools/latency_probe.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import functions as F

    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("latency-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for _ in range(5):  # JIT/codegen warmup outside the timed loops
        spark.range(0, 1, 1, 1).count()

    # numPartitions=1 EXPLICIT: bare spark.range(1) defaults to
    # defaultParallelism partitions (32 here), which silently made the
    # "one task" probe a 32-task job (review r11)
    t0 = time.perf_counter()
    for _ in range(reps):
        spark.range(0, 1, 1, 1).count()
    one_task = (time.perf_counter() - t0) / reps

    # explicit numPartitions=32, NO repartition(): a repartition inserts
    # a round-robin exchange, which would make this a 2-stage shuffle
    # measurement instead of the pure 32-task fan-out it claims
    # (review r11 — the first recorded baseline had that flaw)
    t0 = time.perf_counter()
    for _ in range(max(reps // 5, 1)):
        spark.range(0, 32 * 1000, 1, 32).count()
    fan_out = (time.perf_counter() - t0) / max(reps // 5, 1)

    t0 = time.perf_counter()
    for _ in range(max(reps // 10, 1)):
        spark.range(32 * 1000).groupBy((F.col("id") % 7).alias("k")).count().count()
    shuffle = (time.perf_counter() - t0) / max(reps // 10, 1)

    print(json.dumps({
        "metric": "job_latency_ms",
        "one_task": round(one_task * 1000, 1),
        "fan_out_32": round(fan_out * 1000, 1),
        "two_stage_shuffle": round(shuffle * 1000, 1),
        "reps": reps,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
