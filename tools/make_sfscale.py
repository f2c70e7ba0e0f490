#!/usr/bin/env python
"""Synthesize a K×-scale PERFORMANCE dataset from an existing testdata dir.

The driver provides sf0.001/0.01/0.1; the measured-scaling table in
SCALE.md needs one more decade.  This tool unions K deterministic copies
of each sf0.1 table with:

- **key offsets** (copy i adds ``i * OFFSET`` to every entity key) so
  join fan-outs and group cardinalities scale linearly, never quadratically;
- **content perturbation** where identical payloads would distort the
  workload: document text is token-ROTATED per copy (same token multiset —
  unigram stats, lengths and quality scores keep their distribution — but
  different 3-gram shingles, so near-dup candidate structure scales ~K×
  instead of exploding into K-cliques of verbatim copies), and embedding
  components get a tiny per-copy additive shift (breaks exact ties in
  top-k without moving the distribution);
- dimension tables ``region``/``nation`` copied as-is (they are fixed-size
  dimensions at every SF, like TPC-H).

This is a PERF dataset only: oracle/correctness runs stay on the driver's
own testdata.  Output goes to ``.scratch/sf<K*0.1>`` inside the repo
(gitignored).

Usage: python tools/make_sfscale.py [--copies 10]
       [--src /root/testdata/sf0.1] [--out .scratch/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFFSET = 10_000_000  # > any entity key at the source SF

# per-table integer key columns that get the copy offset
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
AS_IS = ["region", "nation"]


def scaled_copy(df, table: str, i: int):
    from pyspark.sql import functions as F

    out = df
    for kc in KEY_COLS.get(table, []):
        out = out.withColumn(kc, F.col(kc) + F.lit(i * OFFSET))
    if table == "documents" and i > 0:
        # rotate the token sequence by 7*i: shingle sets diverge between
        # copies while token multiset (and thus length/quality stats) hold
        toks = F.split(F.col("text"), r"\s+")
        n = F.greatest(F.size(toks), F.lit(1))
        r = F.pmod(F.lit(7 * i), n)
        rotated = F.concat(
            F.slice(toks, r + F.lit(1), n), F.slice(toks, F.lit(1), r)
        )
        out = out.withColumn("text", F.array_join(rotated, " "))
    if table == "embeddings" and i > 0:
        shift = F.lit(float(i) * 1e-3)
        out = out.withColumn(
            "embedding",
            F.transform(F.col("embedding"), lambda x: (x + shift).cast("float")),
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", "sf1"))
    args = ap.parse_args()

    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.session import get_spark

    spark = get_spark("make_sfscale")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    for table in AS_IS + list(KEY_COLS):
        src_path = os.path.join(args.src, f"{table}.parquet")
        if not os.path.exists(src_path):
            continue
        df = spark.read.parquet(src_path)
        if table in AS_IS:
            scaled = df
        else:
            copies = [scaled_copy(df, table, i) for i in range(args.copies)]
            scaled = copies[0]
            for c in copies[1:]:
                scaled = scaled.unionByName(c)
        out_path = os.path.join(args.out, f"{table}.parquet")
        scaled.write.mode("overwrite").parquet(out_path)
        print(f"[ok] {table}: {spark.read.parquet(out_path).count()} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
