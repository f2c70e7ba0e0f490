#!/usr/bin/env python
"""Dump ``explain("formatted")`` for the given keys to files.

Usage: python tools/explain_dump.py --out plans/r14 --suffix _before key [key ...]

Writes ``<out>/<key><suffix>.txt`` for each key — the before/after plan
evidence the optimization round commits alongside code changes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    import __spark_entry__ as entrymod
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.session import get_spark

    args = sys.argv[1:]
    out_dir = "plans/r14"
    suffix = ""
    if "--out" in args:
        i = args.index("--out")
        out_dir = args[i + 1]
        del args[i : i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    keys = args
    qs = entrymod.queries()
    unknown = [k for k in keys if k not in qs]
    if unknown:
        print(f"unknown key(s): {unknown}")
        return 2
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for key in keys:
        df = qs[key](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{key}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
