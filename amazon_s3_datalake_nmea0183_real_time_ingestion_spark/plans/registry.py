"""Registry pairing each engine op key with its Spark implementation and
(when SQL-expressible) the exactly-equivalent DuckDB oracle SQL.

Contract (driver, __spark_entry__.py): the Spark result and the oracle
result must agree on row count, sorted column names, and order-insensitive
value hash at sf0.01.  Rules that keep hashes stable across engines:

- alias every computed column identically on both sides;
- ROUND every floating aggregate (both sides round to the same decimals →
  both engines materialize the identical float64);
- CAST DuckDB integer sums to BIGINT (DuckDB widens to HUGEINT, which
  pandas would turn into float64);
- avoid returning raw timestamps: cast to DATE or format as text.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table


@dataclass(frozen=True)
class Query:
    key: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over pre-registered views; None → rows-only check


REGISTRY: dict[str, Query] = {}


def register(key: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[key] = Query(key=key, fn=fn, oracle=oracle)
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
