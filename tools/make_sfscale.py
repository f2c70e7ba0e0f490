#!/usr/bin/env python
"""Synthesize a K×-scale PERFORMANCE dataset from an existing testdata dir.

The driver provides sf0.001/0.01/0.1; the measured-scaling table in
SCALE.md needs one more decade.  This tool unions K deterministic copies
of each sf0.1 table with:

- **key offsets** (copy i adds ``i * OFFSET`` to every entity key) so
  join fan-outs and group cardinalities scale linearly, never quadratically;
- **content perturbation** where identical payloads would distort the
  workload: document text is token-SHUFFLED per copy (tokens reordered by
  a per-copy hash sort — same token multiset, so unigram stats, lengths
  and quality scores keep their distribution, but the 3-gram shingle sets
  of two copies are ~disjoint, so near-dup candidate structure scales ~K×
  instead of exploding into K-cliques; a mere ROTATION would NOT work —
  rotating n tokens by any offset shares n-4 of n cyclic 3-grams with the
  original, Jaccard (n-4)/n ≈ 0.93, still a near-dup), and embedding
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
        # deterministic per-copy token SHUFFLE: sort tokens by
        # md5(token || copy || position).  Token multiset (and thus
        # length/quality stats) hold, but consecutive-token 3-grams are
        # destroyed, so copies are NOT near-dups of each other —
        # verified: rotation instead leaves Jaccard ≈ (n-4)/n between
        # copies, which degenerates the corpus into K-cliques.
        toks = F.split(F.col("text"), r"\s+")
        keyed = F.transform(
            toks,
            lambda t, j: F.struct(
                F.md5(
                    F.concat_ws("|", t, F.lit(str(i)), j.cast("string"))
                ).alias("k"),
                t.alias("t"),
            ),
        )
        shuffled = F.transform(F.array_sort(keyed), lambda s: s["t"])
        out = out.withColumn("text", F.array_join(shuffled, " "))
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
