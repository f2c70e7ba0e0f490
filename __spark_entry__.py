"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real implementations live in the
``amazon_s3_datalake_nmea0183_real_time_ingestion_spark`` package; this
module only adapts its plan registry to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.plans import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: latest state per device/user —
    the reference's core analytic shape ('latest known position and
    battery voltage per device', SURVEY.md §7.2)."""
    return REGISTRY["q_win_rank"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator key from SURVEY.md §2."""
    return {key: q.fn for key, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible key."""
    return {key: q.oracle for key, q in REGISTRY.items() if q.oracle is not None}
