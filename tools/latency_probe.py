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
next to the bench totals.  Reference points measured round 11
(kernel 6.18.5-fc-v20, OpenJDK 17.0.20, local[32]): 95.7 ms / 444.7 ms
/ 254.8 ms — the round where full-bench totals sat ~21% above the
round-9-era records with unchanged plans.

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
        spark.range(1).count()

    t0 = time.perf_counter()
    for _ in range(reps):
        spark.range(1).count()
    one_task = (time.perf_counter() - t0) / reps

    t0 = time.perf_counter()
    for _ in range(max(reps // 5, 1)):
        spark.range(32 * 1000).repartition(32).count()
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
