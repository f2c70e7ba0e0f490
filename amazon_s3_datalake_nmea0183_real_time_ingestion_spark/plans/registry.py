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
- avoid returning raw timestamps: cast to DATE or format as text;
- order window ASC keys NULLS LAST on the Spark side (DuckDB's ASC
  default; Spark's is NULLS FIRST) and use ``[[:space:]]`` — not ``\\s`` —
  in DuckDB regexes (RE2 ``\\s`` misses vertical tab; Java ``\\s`` and RE2
  ``[[:space:]]`` agree).

Known cross-engine boundary semantics (documented, not defended against —
the driver's generated data does not hit them):

- ``round()`` half-way ties: Spark rounds the double's shortest decimal
  repr HALF_UP (1.005 → 1.01); DuckDB rounds the binary value (1.005 →
  1.00).  Values whose shortest repr ends in 5 at the rounded digit can
  hash-mismatch.
- unrounded float THRESHOLDS (e.g. ``cos >= 0.99``) sit on ULP knife
  edges when the two engines compute the quantity with different (all
  individually correct) float formulas.
- degenerate zero-norm vectors — GUARDED since round 7, no longer a live
  boundary: ``prep_vectors`` screens zero-norm/NULL/empty vectors by
  default and every x_sim_* family oracle mirrors the screen with
  ``list_dot_product(v, v) > 0`` (the semantic_dedup convention), so
  neither engine's degenerate-cosine representation (Spark NULL via
  try_divide vs DuckDB -1.0/NaN) can reach a ranked comparison.  The
  guard is adjudicated by ``x_sim_zero_norm``, which PLANTS a zero
  vector in both query and corpus roles.
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
