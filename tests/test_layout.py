"""Z-order layout rewrite: file envelopes must be tighter than an
unclustered layout on BOTH dimensions, and the rewrite loses no rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.operators.layout import (
    file_envelopes,
    morton_sql,
    zorder_write,
)

SF = "/root/testdata/sf0.001"


def _pruning_power(envs, dims, lo, hi) -> float:
    """Mean normalized envelope width across files and dimensions — the
    fraction of the key range a point predicate must scan; smaller is
    better."""
    widths = []
    for r in envs:
        for c in dims:
            widths.append((r[f"{c}_max"] - r[f"{c}_min"]) / (hi[c] - lo[c]))
    return sum(widths) / len(widths)


def test_zorder_write_tightens_envelopes_on_both_dims(spark, tmp_path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    dims = ["l_partkey", "l_suppkey"]
    bounds = li.agg(
        *[F.min(c).alias(f"lo_{c}") for c in dims],
        *[F.max(c).alias(f"hi_{c}") for c in dims],
    ).first()
    lo = {c: bounds[f"lo_{c}"] for c in dims}
    hi = {c: bounds[f"hi_{c}"] for c in dims}

    zpath = str(tmp_path / "zordered")
    rpath = str(tmp_path / "roundrobin")
    zorder_write(li, dims, zpath, n_files=16)
    li.repartition(16).write.parquet(rpath)  # unclustered baseline

    z = spark.read.parquet(zpath)
    assert z.count() == li.count()
    assert set(z.columns) == set(li.columns)  # key column dropped

    z_power = _pruning_power(
        file_envelopes(spark, zpath, dims).collect(), dims, lo, hi
    )
    r_power = _pruning_power(
        file_envelopes(spark, rpath, dims).collect(), dims, lo, hi
    )
    # round-robin files span ~the full range on every dim (power ~1.0);
    # z-ordered files must cover well under half the range on average
    assert r_power > 0.9, r_power
    assert z_power < 0.5 * r_power, (z_power, r_power)


def test_zorder_write_int32_wide_range(spark, tmp_path):
    """IntegerType dimensions with a value range past 2^15 used to wrap at
    int32 in the (col - lo) * 65535 normalization multiply (non-ANSI mode
    overflows silently), garbling Morton keys.  The widened-to-long path
    must produce a layout as tight as the BIGINT path does."""
    n = 20_000
    df = spark.range(n).select(
        # int32 columns spanning ~2_000_000 — far past the wrap threshold
        (F.col("id") * 100).cast("int").alias("a"),
        ((F.lit(n - 1) - F.col("id")) * 100).cast("int").alias("b"),
    )
    dims = ["a", "b"]
    zpath = str(tmp_path / "z_int32")
    zorder_write(df, dims, zpath, n_files=8)
    z = spark.read.parquet(zpath)
    assert z.count() == n

    lo = {"a": 0, "b": 0}
    hi = {"a": (n - 1) * 100, "b": (n - 1) * 100}
    power = _pruning_power(
        file_envelopes(spark, zpath, dims).collect(), dims, lo, hi
    )
    # a and b are perfectly anti-correlated, so a correct 2-D interleave
    # still yields tight per-file envelopes; wrapped keys scatter rows and
    # push the mean envelope width toward 1.0.
    assert power < 0.5, power


def test_zorder_write_fractional_dims(spark, tmp_path):
    """Double dimensions with sub-integer ranges (scores in [0,1], lat/lon
    fractions) must normalize at full precision — a long-widened
    normalization would floor them to a handful of buckets and the
    dimension would stop contributing to the Morton key."""
    n = 20_000
    df = spark.range(n).select(
        (F.col("id") / n).cast("double").alias("a"),          # [0, 1)
        ((F.lit(n - 1) - F.col("id")) / n * 0.5).alias("b"),  # [0, 0.5)
    )
    dims = ["a", "b"]
    zpath = str(tmp_path / "z_frac")
    zorder_write(df, dims, zpath, n_files=8)
    assert spark.read.parquet(zpath).count() == n
    lo = {"a": 0.0, "b": 0.0}
    hi = {"a": (n - 1) / n, "b": (n - 1) / n * 0.5}
    power = _pruning_power(
        file_envelopes(spark, zpath, dims).collect(), dims, lo, hi
    )
    assert power < 0.5, power


def test_morton_sql_interleaves_bits():
    # 3-bit check: x=0b101, y=0b011 -> z bits x0,y0,x1,y1,x2,y2 = 1,1,0,1,1,0
    expr = morton_sql(["x", "y"], bits=3)
    import duckdb

    z = duckdb.sql(f"SELECT {expr} AS z FROM (SELECT 5 AS x, 3 AS y)").fetchone()[0]
    assert z == 0b011011  # positions: x@0,2,4 = 1,0,1; y@1,3,5 = 1,1,0


def test_morton_sql_roundtrips_any_input():
    """The interleave is a bijection: decoding the SQL-computed key
    recovers the inputs exactly (hypothesis sweep, 3 dims included)."""
    import duckdb
    from hypothesis import given, settings, strategies as st

    def decode(z: int, n: int, bits: int) -> list[int]:
        vals = [0] * n
        for j in range(bits):
            for d in range(n):
                vals[d] |= ((z >> (j * n + d)) & 1) << j
        return vals

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=(1 << 16) - 1),
                 min_size=2, max_size=3)
    )
    def check(vals):
        n = len(vals)
        cols = [f"c{i}" for i in range(n)]
        sel = ", ".join(f"{v} AS c{i}" for i, v in enumerate(vals))
        z = duckdb.sql(
            f"SELECT {morton_sql(cols, 16)} AS z FROM (SELECT {sel})"
        ).fetchone()[0]
        assert decode(z, n, 16) == vals

    check()
