"""Robust outlier detection: per-group median / MAD statistics and the
3·1.4826·MAD flag rule (Hampel '74; Leys et al. '13) — the anomaly screen
whose reference statistics, unlike mean/stddev z-scores, are not dragged
by the very outliers being hunted.

Two-phase by design so the same scorer serves batch and streaming:

- :func:`mad_stats` FITS on a (reference) batch — two group-keyed exact
  medians; the result is one row per group.
- :func:`flag_outliers` SCORES any frame map-side against those stats
  (broadcast join) — no shuffle of the scored side.
- :func:`streaming_mad_scores` applies the same scorer to an unbounded
  stream (stream-static broadcast join), the fit-offline/score-online
  split every production anomaly pipeline uses: stats refresh on a batch
  cadence (e.g. the maintenance cycle), scoring stays per-record cheap.

Scale: exact ``median`` holds one group's values in executor memory —
right for low-cardinality group keys (event classes, device models); for
high-cardinality groups swap in ``approx_percentile(col, 0.5)`` (mergeable
sketch — the q_agg_approx_quantile path); the flag rule is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_CONSISTENCY = 1.4826  # normal-distribution consistency constant


def mad_stats(df: DataFrame, group_col: str = "event_type",
              value_col: str = "value") -> DataFrame:
    """Per-group (median, MAD): the robust location/scale fit step."""
    med = df.groupBy(group_col).agg(F.median(value_col).alias("med"))
    return (
        df.join(F.broadcast(med), group_col)
        .withColumn("__adev", F.abs(F.col(value_col) - F.col("med")))
        .groupBy(group_col)
        .agg(F.max("med").alias("med"), F.median("__adev").alias("mad"))
    )


def flag_outliers(df: DataFrame, stats: DataFrame,
                  group_col: str = "event_type", value_col: str = "value",
                  k: float = 3.0, keep_stats: bool = False) -> DataFrame:
    """Map-side scoring: adds ``is_outlier`` (|v − med| > k·1.4826·MAD)
    and ``robust_z`` ((v − med) / (1.4826·MAD), NULL when MAD = 0).
    ``stats`` is broadcast — the scored side never shuffles.
    ``keep_stats=True`` keeps the joined med/mad columns so downstream
    reporting doesn't have to re-join (and re-evaluate) the stats plan."""
    dev = F.col(value_col) - F.col("med")
    scale = F.lit(MAD_CONSISTENCY) * F.col("mad")
    out = (
        df.join(F.broadcast(stats), group_col)
        .withColumn("robust_z", F.try_divide(dev, scale))
        .withColumn("is_outlier", F.abs(dev) > F.lit(k) * scale)
    )
    return out if keep_stats else out.drop("med", "mad")


def streaming_mad_scores(stream: DataFrame, stats: DataFrame,
                         group_col: str = "event_type",
                         value_col: str = "value",
                         k: float = 3.0) -> DataFrame:
    """Score an unbounded stream against batch-fitted stats (stream-static
    broadcast join — stateless, append-mode safe).  Re-fit ``stats`` on
    whatever cadence the reference window demands; Spark re-resolves the
    static side per micro-batch, so swapping the stats table between
    triggers takes effect without restarting the query."""
    return flag_outliers(stream, stats, group_col, value_col, k)
