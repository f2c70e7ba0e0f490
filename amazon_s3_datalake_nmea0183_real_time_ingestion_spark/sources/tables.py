"""Parquet table loaders for the driver testdata (TESTDATA.md).

Plain ``spark.read.parquet`` — declarative scans so Catalyst gets predicate
pushdown + column pruning for free.  ``register_temp_views`` mirrors the
DuckDB oracle's pre-registered view names so ``spark.sql`` text can be
shared verbatim between engines where dialects agree.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
        # parquet reader rejects.  Read nanos as long, then truncate to a
        # microsecond TimestampType — the same precision DuckDB (and most
        # engines) use, so cross-engine comparisons are exact.
        # NOTE: this conf is SESSION-WIDE and deliberately left set (also a
        # get_spark default): restoring it before the lazy scan executes
        # would break the read; any later NANOS parquet in the session
        # will likewise surface as long columns.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
