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
from pyspark.sql.types import LongType, TimestampNTZType

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
        # Some testdata generations write events.ts as TIMESTAMP(NANOS),
        # which Spark's vectorized parquet reader rejects; others write
        # plain TIMESTAMP(MICROS, isAdjustedToUTC=false).  Handle both and
        # normalize to a microsecond TimestampType — the precision DuckDB
        # (and most engines) use, so cross-engine comparisons are exact,
        # and the tz-aware type every downstream expression (unix_micros,
        # session_window, range frames) was written against.  With the UTC
        # session timezone (get_spark default) the NTZ→TZ cast is
        # value-preserving.
        # NOTE: the conf is SESSION-WIDE and deliberately left set (also a
        # get_spark default): restoring it before the lazy scan executes
        # would break the read; any later NANOS parquet in the session
        # will likewise surface as long columns.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
