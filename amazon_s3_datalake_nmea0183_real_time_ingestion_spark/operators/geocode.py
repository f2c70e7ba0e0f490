"""Reverse-geocode enrichment as a broadcast dimension join
(SURVEY.md §2 A11, §7.4.2; reference: hello.py:28-45,96,138-156).

The reference calls Amazon Location's PlaceIndex once per record
(MaxResults=1).  A per-row external API call cannot survive 100 TB; the
Spark-first replacement is a **static geo dimension** keyed by 1°×1° grid
cell, broadcast to every executor (64,800 rows ≈ a few MB), so enrichment
is a hash-probe inside whole-stage codegen with zero shuffle.

The dimension is *deterministic* — every attribute is a pure arithmetic
function of the cell id — so any SQL oracle can regenerate it exactly
(see plans/oracle_fragments.geo_dim_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import GEO_COLUMNS

GRID_CELLS = 180 * 360  # 64,800


def grid_cell(lon: Column, lat: Column) -> Column:
    """1°×1° grid-cell id in [0, 64800): (floor(lat)+90)*360 + floor(lon)+180.

    Inputs are clamped to the valid lat/lon domain so edge values (±90/±180)
    land in the boundary cell rather than out of range.  NULL lat or lon →
    NULL cell (greatest/least skip NULLs, so without the explicit guard a
    NULL coordinate would silently clamp into cell 0 and pick up that
    cell's fabricated address).
    """
    lat_c = F.least(F.greatest(lat, F.lit(-90.0)), F.lit(89.999999))
    lon_c = F.least(F.greatest(lon, F.lit(-180.0)), F.lit(179.999999))
    cell = (
        (F.floor(lat_c) + F.lit(90)) * F.lit(360) + F.floor(lon_c) + F.lit(180)
    ).cast("bigint")
    return F.when(lat.isNull() | lon.isNull(), F.lit(None).cast("bigint")).otherwise(cell)


def build_geo_dim(spark: SparkSession) -> DataFrame:
    """The deterministic geo dimension: cell -> 9 enrichment attributes
    (the exact attribute set the reference pulls from Amazon Location,
    hello.py:148-156).  timezone_offset is seconds east of UTC derived from
    the cell's longitude band (15° per hour)."""
    cell = F.col("id")
    lon_west = (cell % 360) - 180  # western edge of the cell, degrees
    return spark.range(GRID_CELLS).select(
        cell.alias("geo_cell"),
        (cell % 9999 + 1).cast("string").alias("addressnumber"),
        F.concat(F.lit("Street "), (cell % 1000).cast("string")).alias("street"),
        F.concat(F.lit("City-"), (cell % 500).cast("string")).alias("municipality"),
        F.concat(F.lit("Region-"), (cell % 100).cast("string")).alias("region"),
        F.concat(F.lit("Sub-"), (cell % 200).cast("string")).alias("subregion"),
        F.lpad((cell % 100000).cast("string"), 5, "0").alias("postalcode"),
        F.concat(F.lit("Country-"), (cell % 240).cast("string")).alias("country"),
        F.concat(F.lit("Zone/"), (cell % 24).cast("string")).alias("timezone_name"),
        (F.floor((lon_west + 180) / 15) * 3600 - 12 * 3600)
        .cast("int")
        .alias("timezone_offset"),
    )


def enrich_geocode(
    df: DataFrame,
    geo_dim: DataFrame,
    lon_col: str = "longitude",
    lat_col: str = "latitude",
) -> DataFrame:
    """Broadcast-join the 9 geo attributes onto df by grid cell.

    Left join: rows with null/invalid coordinates keep null enrichment —
    the reference would instead fail the record; our error routing keeps
    them visible (SURVEY.md §7.5)."""
    keyed = df.withColumn("geo_cell", grid_cell(F.col(lon_col), F.col(lat_col)))
    return keyed.join(F.broadcast(geo_dim), "geo_cell", "left").drop("geo_cell")


def geo_columns() -> list[str]:
    return list(GEO_COLUMNS)


# ---------------------------------------------------------------------------
# too-big-to-broadcast fallback: bucketed dimension, co-partitioned join.
# The 1°×1° grid dim broadcasts (64,800 rows ≈ MBs), but a richer dimension
# — parcel-level reverse geocoding, 100m cells, per-address records — can
# reach 100s of GB, past any broadcast threshold.  The scale path writes
# the dim ONCE as a bucketed table on the join key; every subsequent
# enrichment joins against it with NO dim-side exchange and NO fact-side
# shuffle beyond the one explicit co-partitioning exchange (which replaces
# the shuffle a plain sort-merge join would have needed anyway).
# ---------------------------------------------------------------------------


def write_bucketed_geo_dim(
    geo_dim: DataFrame, table_name: str, n_buckets: int = 32
) -> None:
    """Persist the geo dimension bucketed + sorted by ``geo_cell``.

    One-time (or per-dim-refresh) cost: a shuffle into ``n_buckets``
    files whose layout the catalog records as
    ``HashPartitioning(geo_cell, n_buckets)``.  At 100 TB the bucket
    count should be sized so each bucket file is ~128-512 MB."""
    (
        geo_dim.write.mode("overwrite")
        .bucketBy(n_buckets, "geo_cell")
        .sortBy("geo_cell")
        .format("parquet")
        .saveAsTable(table_name)
    )


def table_bucket_count(spark: SparkSession, table_name: str) -> int:
    """Read a table's bucket count from the catalog (DESCRIBE FORMATTED),
    so callers can't drift from the layout the writer recorded."""
    for row in spark.sql(f"DESCRIBE FORMATTED {table_name}").collect():
        if row["col_name"].strip() == "Num Buckets":
            return int(row["data_type"].strip())
    raise ValueError(f"table {table_name!r} is not bucketed")


def enrich_geocode_bucketed(
    df: DataFrame,
    spark: SparkSession,
    table_name: str,
    lon_col: str = "longitude",
    lat_col: str = "latitude",
    n_buckets: int | None = None,
) -> DataFrame:
    """Enrich against a dimension too big to broadcast: sort-merge join
    against the bucketed dim table written by
    :func:`write_bucketed_geo_dim`.

    The fact side is explicitly repartitioned to the dim's exact bucket
    layout (``HashPartitioning(geo_cell, n_buckets)``), so
    EnsureRequirements adds NO further exchange on either side: the dim
    scan's bucketing satisfies the join requirement directly (zero
    dim-side shuffle — the payoff: the big dim never moves after its
    one-time bucket write) and the fact's repartition IS the join
    distribution.  The bucket count is read from the CATALOG by default —
    a caller-supplied count that disagreed with the written layout would
    silently reintroduce the reconciling exchange this function exists to
    avoid.  ``merge`` hint pins sort-merge so a small test dim doesn't
    silently take the broadcast path.  Plan-asserted in
    tests/test_scale_plans.py."""
    if n_buckets is None:
        n_buckets = table_bucket_count(spark, table_name)
    dim = spark.table(table_name)
    keyed = df.withColumn("geo_cell", grid_cell(F.col(lon_col), F.col(lat_col)))
    keyed = keyed.repartition(n_buckets, "geo_cell")
    return keyed.join(dim.hint("merge"), "geo_cell", "left").drop("geo_cell")
