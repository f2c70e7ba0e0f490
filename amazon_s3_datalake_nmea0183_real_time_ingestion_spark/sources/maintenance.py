"""Catalog/table maintenance jobs (SURVEY.md §2 A20; reference: the nightly
Glue crawler, cdk_datalake_mvp_stack.py:320-335).

The crawler runs with ``update_behavior: LOG, delete_behavior: LOG`` —
schema drift is DETECTED and reported, never applied; the declared schema
stays authoritative (SURVEY.md §1.3). ``schema_drift_report`` reproduces
exactly that contract. ``compact_partition`` is the at-rest analog of the
Firehose 64 MB buffer intent: rewrite a partition's many small files into
few large ones (BASELINE.md "output file sizing").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def schema_drift_report(spark: SparkSession, path: str,
                        declared: StructType, fmt: str = "parquet") -> DataFrame:
    """Diff the OBSERVED schema of the files at ``path`` against the
    DECLARED schema — report, don't apply (crawler LOG behavior).

    Returns one row per column union: ``column, declared_type,
    observed_type, status`` with status in ``ok | type_changed | added |
    missing`` (added = in files only; missing = declared only).

    Inference cost note: parquet/json footer-based inference reads
    metadata, not data — safe to run as a scheduled job at any scale.
    """
    if fmt == "parquet":
        observed = spark.read.parquet(path).schema
    elif fmt == "json":
        observed = spark.read.json(path).schema
    else:
        raise ValueError(f"unsupported format: {fmt}")

    dec = {f.name.lower(): f.dataType.simpleString() for f in declared.fields}
    obs = {f.name.lower(): f.dataType.simpleString() for f in observed.fields}
    rows = []
    for name in sorted(dec.keys() | obs.keys()):
        d, o = dec.get(name), obs.get(name)
        if d is None:
            status = "added"
        elif o is None:
            status = "missing"
        elif d != o:
            status = "type_changed"
        else:
            status = "ok"
        rows.append((name, d, o, status))
    return spark.createDataFrame(
        rows, "column string, declared_type string, observed_type string, status string"
    )


def compact_partition(spark: SparkSession, table_path: str, partition_expr: str,
                      target_files: int = 1) -> int:
    """Rewrite one Hive partition's files into ``target_files`` files
    (small-file compaction; the 64 MB Firehose buffering intent applied
    retroactively). Returns the number of rows rewritten.

    Scale note: compaction is per-partition (`partition_expr` like
    ``year=2023/month=11/day=14``), so a fleet of compaction tasks
    parallelizes across partitions with no shuffle — each task is a
    coalesce-rewrite of one directory.
    """
    part_dir = f"{table_path}/{partition_expr}"
    df = spark.read.parquet(part_dir)
    n = df.count()
    tmp = f"{part_dir}__compact_tmp"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    # atomic-ish swap through the Hadoop FS API (works for local + HDFS/S3A)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(
        jvm.java.net.URI.create(table_path), conf
    )
    src = jvm.org.apache.hadoop.fs.Path(tmp)
    dst = jvm.org.apache.hadoop.fs.Path(part_dir)
    fs.delete(dst, True)
    fs.rename(src, dst)
    return n


def refresh_rollup(spark: SparkSession, stage_path: str, rollup_path: str,
                   touched_keys: list[tuple]) -> int:
    """Continuous-aggregate maintenance (the hypertable-rollup analog):
    keep a materialized daily-per-device rollup of ``stage`` fresh by
    recomputing ONLY the event-day partitions a micro-batch touched.

    Partition-level incremental view maintenance: the rollup is a pure
    function of stage, so recomputing touched (year, month, day)
    partitions from the source of truth is idempotent under batch replay
    — no partial-aggregate merge state to corrupt (replaying a batch
    recomputes the same partitions to the same values; contrast a
    delta-merge scheme, where replay double-counts unless gated).
    Dynamic partition overwrite rewrites exactly the touched directories
    and leaves every other partition's files untouched.

    At 100 TB: a micro-batch touches a handful of event days (late data
    included — SURVEY.md §7.4.5), so each refresh scans only those
    partitions of stage (partition pruning on the y/m/d filter), not the
    table; the rollup write shuffles once on its group keys.

    ``touched_keys``: [(year, month, day), ...] — int partition values.
    Returns the number of rollup rows (re)written.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    if not touched_keys:
        return 0
    pred = reduce(
        lambda a, b: a | b,
        [
            (F.col("year") == y) & (F.col("month") == m) & (F.col("day") == d)
            for (y, m, d) in touched_keys
        ],
    )
    agg = (
        spark.read.parquet(stage_path)
        .filter(pred)
        .groupBy("deviceid", "year", "month", "day")
        .agg(
            F.count("*").alias("n_heartbeats"),
            F.round(F.avg("battery_voltage"), 4).alias("avg_battery_voltage"),
            F.round(F.avg("solar_panel_voltage"), 4).alias("avg_solar_voltage"),
            F.min("date_time").alias("first_seen"),
            F.max("date_time").alias("last_seen"),
        )
    )
    n = agg.count()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            agg.repartition("year", "month", "day")
            .write.mode("overwrite")
            .partitionBy("year", "month", "day")
            .parquet(rollup_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return n


DRIFT_DEFAULT_COLUMNS: dict[str, str] = {
    # 1-volt bins: wide enough to be stable per-batch, narrow enough that a
    # fleet-wide voltage regression moves mass across bins
    "battery_voltage": "CAST(floor(battery_voltage) AS STRING)",
    # categorical: the device-mix profile (a fleet segment going silent or
    # a new fleet joining shifts this before any value column moves)
    "deviceid": "CAST(deviceid AS STRING)",
}


def _drift_counts(df: DataFrame, columns: dict[str, str]) -> DataFrame:
    """(column, bucket, n) counts for every monitored column in ONE job —
    the per-column bucket maps are unioned before the single groupBy, so
    the profile costs one scan + one tiny shuffle regardless of how many
    dimensions are monitored (same economics as stage_quality_report)."""
    parts = [
        df.select(
            F.lit(col).alias("column"),
            F.coalesce(F.expr(expr), F.lit("__null__")).alias("bucket"),
        )
        for col, expr in columns.items()
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("column", "bucket").agg(F.count("*").alias("n"))


def drift_psi_report(
    spark: SparkSession,
    stage_path: str,
    profile_path: str,
    columns: dict[str, str] | None = None,
    threshold: float = 0.2,
) -> dict:
    """Population-stability-index drift monitor over the stage zone — the
    maintenance-cadence counterpart of the batch ``x_drift_psi`` key
    (plans/tiere.py), with a PERSISTED reference-period profile instead of
    a same-table midpoint split.

    First call (no profile at ``profile_path``): the current bucket
    profile is WRITTEN as the reference period and the report says
    ``bootstrapped``.  Every later call compares the current stage
    distribution against that frozen profile per monitored column, with
    the same smoothed PSI the batch key uses (Siddiqi '06; +0.5/bucket
    Laplace smoothing so empty buckets don't produce ±inf) and the same
    0.2 industry drift threshold.  Re-bootstrap by deleting the profile
    (e.g. after an intentional fleet change).

    Scale: the profile is bucket-count sized (columns × buckets rows —
    KBs at any corpus size), so both the persisted artifact and the
    full-outer bucket join are driver-trivial; the only data-sized work
    is the one profile scan, which at 100 TB should read only the recent
    event-date partitions (partition-pruned by the caller's cadence).

    Returns ``{"bootstrapped": bool, "columns": {col: {"psi": float|None,
    "drifted": bool, "n_ref": int, "n_cur": int}}}`` (plain dict,
    foreachBatch-safe).
    """
    import os as _os

    cols = columns or DRIFT_DEFAULT_COLUMNS
    cur = _drift_counts(spark.read.parquet(stage_path), cols)
    if not _os.path.isdir(profile_path):
        cur.write.mode("overwrite").parquet(profile_path)
        return {"bootstrapped": True, "columns": {}}
    ref = spark.read.parquet(profile_path).select(
        "column", "bucket", F.col("n").alias("n_ref")
    )
    joined = (
        ref.join(
            cur.select("column", "bucket", F.col("n").alias("n_cur")),
            ["column", "bucket"],
            "full_outer",
        )
        .fillna(0, ["n_ref", "n_cur"])
    )
    tot = joined.groupBy("column").agg(
        F.sum("n_ref").alias("t_ref"),
        F.sum("n_cur").alias("t_cur"),
        F.count("*").alias("k"),
    )
    p = (F.col("n_ref") + 0.5) / (F.col("t_ref") + 0.5 * F.col("k"))
    q = (F.col("n_cur") + 0.5) / (F.col("t_cur") + 0.5 * F.col("k"))
    scored = (
        joined.join(F.broadcast(tot), "column")
        .groupBy("column")
        .agg(
            F.sum((p - q) * F.log(p / q)).alias("psi_raw"),
            F.max("t_ref").alias("t_ref"),
            F.max("t_cur").alias("t_cur"),
        )
        .collect()  # control-plane: one row per monitored column
    )
    return {
        "bootstrapped": False,
        "columns": {
            r["column"]: {
                "psi": round(float(r["psi_raw"]), 6),
                "drifted": bool(r["psi_raw"] > threshold),
                "n_ref": int(r["t_ref"]),
                "n_cur": int(r["t_cur"]),
            }
            for r in scored
        },
    }


def timeseries_monitor_report(
    spark: SparkSession,
    stage_path: str,
    value_col: str = "battery_voltage",
    key_col: str = "deviceid",
    ts_col: str = "date_time",
    cusum_k_sigma: float = 0.25,
    cusum_alarm_sigma: float = 3.0,
    season: int = 7,
) -> dict:
    """Per-device time-series health monitors at the maintenance cadence —
    the streaming-maintenance twins of the batch ``x_cusum_changepoint``
    and ``x_forecast_mase`` keys (plans/tierk.py), the way
    ``drift_psi_report`` twins ``x_drift_psi``: a monitor that only runs
    in batch mode isn't a monitor.

    ONE stage scan feeds ONE daily rollup per device (map-side
    combinable: avg for the CUSUM level series, sum for the MASE totals
    series), then both statistics ride the tiny per-device day series.
    Days are UTC epoch-day integers (floor(epoch/86400)) so boundaries —
    and therefore alarms — are identical under every deployment session
    timezone (r8 ADVICE):

    - **CUSUM** (Page '54, identical formula to the batch key including
      the S'_0 = 0 floor): C_t = S'_t − min(0, S'_1..S'_t) with drift
      allowance k = ``cusum_k_sigma``·σ, alarm at C_t >
      ``cusum_alarm_sigma``·σ — sustained upward mean shift per device.
    - **MASE** (Hyndman–Koehler IJF'06): seasonal-naive (lag-``season``)
      forecast of daily totals scored by MAE and scaled by the one-step
      naive MAE — "is this device's daily volume still forecastable".

    Returns ``{key: {"n_days": int, "cusum_alarms": int,
    "alarm_latest": bool, "cusum_max": float, "mase": float|None,
    "mase_n_scored": int}}`` (plain dict, foreachBatch-safe; one row per
    device is control-plane at any corpus size).  ``mase`` is None until
    a device has > ``season`` days of history or when both MAEs are 0.

    Scale: the corpus-sized work is the single daily rollup; every
    window after it runs over (devices × days) rows.  At 100 TB the
    caller's cadence should partition-prune the stage scan to the
    monitoring lookback window.
    """
    from pyspark.sql.window import Window as W

    df = spark.read.parquet(stage_path).filter(F.col(value_col).isNotNull())
    # Day buckets are UTC epoch-days (floor(epoch/86400)) — a pure integer
    # with NO session-timezone dependency.  The previous
    # to_date(from_unixtime(...)) rendered in the Spark session timezone,
    # so the same stage data produced different day boundaries (and a
    # different alarm_latest) per deployment TZ (r8 ADVICE).
    d = df.groupBy(
        F.col(key_col).alias("k"),
        F.floor(F.col(ts_col).cast("bigint") / F.lit(86400))
        .cast("bigint")
        .alias("day"),
    ).agg(
        F.avg(value_col).alias("x"),
        F.sum(value_col).alias("tot"),
    )
    wk = W.partitionBy("k")
    wo = W.partitionBy("k").orderBy("day")
    wrun = wo.rowsBetween(W.unboundedPreceding, W.currentRow)
    m = d.select(
        "k", "day", "x", "tot",
        F.avg("x").over(wk).alias("mu0"),
        F.stddev_samp("x").over(wk).alias("sd"),
        F.lag("tot", season).over(wo).alias("f_seasonal"),
        F.lag("tot", 1).over(wo).alias("f_naive"),
    ).withColumn(
        "sp",
        F.sum(
            F.col("x") - F.col("mu0") - F.lit(cusum_k_sigma) * F.col("sd")
        ).over(wrun),
    ).withColumn(
        "cusum", F.col("sp") - F.least(F.lit(0.0), F.min("sp").over(wrun))
    ).withColumn(
        "alarm",
        (
            F.col("cusum") > F.lit(cusum_alarm_sigma) * F.col("sd")
        ).cast("int"),
    )
    last = W.partitionBy("k").orderBy(F.col("day").desc())
    rows = (
        m.withColumn("rn", F.row_number().over(last))
        .groupBy("k")
        .agg(
            F.count("*").alias("n_days"),
            F.sum(F.coalesce(F.col("alarm"), F.lit(0))).alias("cusum_alarms"),
            F.max(F.when(F.col("rn") == 1, F.col("alarm"))).alias("alarm_latest"),
            F.max("cusum").alias("cusum_max"),
            F.avg(F.abs(F.col("tot") - F.col("f_seasonal"))).alias("mae"),
            F.avg(F.abs(F.col("tot") - F.col("f_naive"))).alias("naive_mae"),
            F.count(F.col("f_seasonal")).alias("mase_n_scored"),
        )
        .collect()  # control-plane: one row per monitored device
    )
    out: dict = {}
    for r in rows:
        mase = None
        if (
            r["mase_n_scored"] > 0
            and r["naive_mae"] is not None
            and r["naive_mae"] > 0.0
        ):
            mase = round(float(r["mae"]) / float(r["naive_mae"]), 6)
        out[r["k"]] = {
            "n_days": int(r["n_days"]),
            "cusum_alarms": int(r["cusum_alarms"]),
            "alarm_latest": bool(r["alarm_latest"]),
            "cusum_max": (
                round(float(r["cusum_max"]), 6)
                if r["cusum_max"] is not None
                else None
            ),
            "mase": mase,
            "mase_n_scored": int(r["mase_n_scored"]),
        }
    return out


def sprt_monitor_report(
    spark: SparkSession,
    stage_path: str,
    success_expr: str = "battery_voltage < 11.0",
    ts_col: str = "date_time",
    p0: float = 0.18,
    p1: float = 0.22,
    alpha: float = 0.05,
    beta: float = 0.05,
) -> dict:
    """Wald SPRT sequential rate monitor at the maintenance cadence — the
    streaming-maintenance twin of the batch ``x_sprt`` key
    (plans/tierl.py), the way ``timeseries_monitor_report`` twins
    x_cusum_changepoint/x_forecast_mase: the sequential test's native
    habitat IS the stream, where someone peeks at every batch.

    Tests H1: P(``success_expr``) = ``p1`` against H0: = ``p0`` on the
    daily fleet rollup (default: the low-battery-reading rate), with the
    Wald boundaries log((1−β)/α) / log(β/(1−α)).  The decision is STICKY
    exactly as in the batch key: the test STOPS at its first boundary
    crossing — recomputing over the append-only stage zone replays the
    full daily sequence, so the first-crossing day (and therefore the
    verdict) can never un-happen even if later data drags the LLR back
    across the boundary (precedence on the running min of each
    boundary's first crossing day; reject wins a same-day tie, matching
    x_sprt).

    Days are UTC epoch-days (floor(epoch/86400)) like the CUSUM/MASE
    monitor — no session-timezone dependence.

    Returns ``{"n_days": int, "cum_n": int, "cum_k": int, "llr": float,
    "decision": "continue"|"reject_h0"|"accept_h0",
    "decided_day": int | None}`` (plain dict, foreachBatch-safe).

    Scale: the corpus-sized work is ONE map-side-combinable daily count;
    the cumulative LLR and crossing scan ride the calendar-sized day
    series, and only the final row is collected.  At 100 TB the caller's
    cadence should partition-prune the scan to the monitoring window —
    or fold the daily (n, k) pairs into a persisted rollup and replay
    the LLR from that, since the statistic depends on the data only
    through the per-day counts.
    """
    import math as _math

    from pyspark.sql.window import Window as W

    c1 = _math.log(p1 / p0)
    c2 = _math.log((1.0 - p1) / (1.0 - p0))
    up = _math.log((1.0 - beta) / alpha)
    lo = _math.log(beta / (1.0 - alpha))
    df = spark.read.parquet(stage_path)
    d = df.groupBy(
        F.floor(F.col(ts_col).cast("bigint") / F.lit(86400))
        .cast("bigint")
        .alias("day")
    ).agg(
        F.count("*").alias("n"),
        # a row whose predicate is NULL (e.g. NULL voltage) is a trial
        # that was NOT a success — coalesce per row so an all-NULL day
        # yields k = 0, not a NULL that poisons the cumulative LLR
        F.sum(
            F.coalesce(F.expr(success_expr).cast("int"), F.lit(0))
        ).alias("k"),
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    c = d.select(
        "day",
        F.sum("n").over(w).cast("bigint").alias("cum_n"),
        F.sum("k").over(w).cast("bigint").alias("cum_k"),
    )
    llr = F.col("cum_k") * F.lit(c1) + (F.col("cum_n") - F.col("cum_k")) * F.lit(c2)
    x = c.select(
        "day",
        "cum_n",
        "cum_k",
        llr.alias("llr"),
        F.min(F.when(llr >= F.lit(up), F.col("day"))).over(w).alias("day_up"),
        F.min(F.when(llr <= F.lit(lo), F.col("day"))).over(w).alias("day_lo"),
        F.count("*").over(w).alias("n_days"),
    )
    rows = x.orderBy(F.col("day").desc()).limit(1).collect()
    if not rows:
        return {
            "n_days": 0, "cum_n": 0, "cum_k": 0, "llr": 0.0,
            "decision": "continue", "decided_day": None,
        }
    r = rows[0]
    day_up, day_lo = r["day_up"], r["day_lo"]
    if day_up is not None and (day_lo is None or day_up <= day_lo):
        decision, decided = "reject_h0", int(day_up)
    elif day_lo is not None:
        decision, decided = "accept_h0", int(day_lo)
    else:
        decision, decided = "continue", None
    return {
        "n_days": int(r["n_days"]),
        "cum_n": int(r["cum_n"]),
        "cum_k": int(r["cum_k"]),
        "llr": round(float(r["llr"]), 6),
        "decision": decision,
        "decided_day": decided,
    }


def pipeline_maintenance(
    spark: SparkSession,
    stage_path: str,
    declared: StructType,
    catalog_tables: list[str] | None = None,
    quality: bool = False,
    drift_profile_path: str | None = None,
    monitor_timeseries: bool = False,
    monitor_sprt: bool = False,
) -> dict:
    """One scheduled-maintenance pass — the in-engine analog of the
    reference's nightly crawler run (``cron(0 4 * * ? *)``,
    cdk_datalake_mvp_stack.py:325): discover new partitions for registered
    tables and LOG (never apply) schema drift on the stage zone.

    Returns ``{"drift": [(column, declared, observed, status), ...],
    "drift_status_counts": {...}, "recovered_tables": [...]}`` — a plain
    dict so foreachBatch callers can append it to a report list without
    touching Spark objects after the batch.  ``drift_profile_path`` adds
    a ``drift_psi`` DISTRIBUTION drift block (see
    :func:`drift_psi_report`) next to the schema drift LOG — schema says
    the shape changed, PSI says the DATA changed under the same shape.
    ``monitor_timeseries=True`` adds a ``timeseries`` block (see
    :func:`timeseries_monitor_report`): per-device CUSUM changepoint +
    MASE forecastability over the stage zone's daily series — schema
    flags shape, PSI flags distribution, CUSUM/MASE flag the TREND.
    ``monitor_sprt=True`` adds a ``sprt`` block (see
    :func:`sprt_monitor_report`): the sequential rate test with its
    sticky stop-at-first-crossing decision — the peeking-safe verdict
    layer on top of the trend monitors.
    """
    import os as _os

    report: dict = {"drift": [], "drift_status_counts": {}, "recovered_tables": []}
    if _os.path.isdir(stage_path):
        drift = schema_drift_report(spark, stage_path, declared)
        rows = [
            (r["column"], r["declared_type"], r["observed_type"], r["status"])
            for r in drift.collect()
        ]
        report["drift"] = rows
        counts: dict[str, int] = {}
        for _, _, _, status in rows:
            counts[status] = counts.get(status, 0) + 1
        report["drift_status_counts"] = counts
    if quality and _os.path.isdir(stage_path):
        report["quality_violations"] = stage_quality_report(spark, stage_path)
    if drift_profile_path and _os.path.isdir(stage_path):
        report["drift_psi"] = drift_psi_report(
            spark, stage_path, drift_profile_path
        )
    if monitor_timeseries and _os.path.isdir(stage_path):
        report["timeseries"] = timeseries_monitor_report(spark, stage_path)
    if monitor_sprt and _os.path.isdir(stage_path):
        report["sprt"] = sprt_monitor_report(spark, stage_path)
    for t in catalog_tables or []:
        if spark.catalog.tableExists(t):
            spark.catalog.recoverPartitions(t)
            report["recovered_tables"].append(t)
    return report


def analyze_tables(spark: SparkSession, tables: list[str],
                   columns: dict[str, list[str]] | None = None) -> dict[str, str]:
    """A20+ maintenance: compute catalog statistics so the cost-based
    optimizer has real cardinalities — table-level row/size stats plus
    optional per-column min/max/NDV histograms (``columns[table]``).

    At 100 TB this is what makes Catalyst's CBO join reordering and
    broadcast decisions correct: without ANALYZE, Spark falls back to
    file-size estimates that ignore selectivity.  Run it after large
    loads/compactions, like the reference's nightly crawler cadence
    (cdk_datalake_mvp_stack.py:325).

    Returns {table: catalog statistics string} for report/assertion.
    """
    out: dict[str, str] = {}
    for t in tables:
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS")
        cols = (columns or {}).get(t)
        if cols:
            col_list = ", ".join(cols)
            spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR COLUMNS {col_list}")
        desc = spark.sql(f"DESCRIBE TABLE EXTENDED {t}").collect()
        stats = [r["data_type"] for r in desc if r["col_name"] == "Statistics"]
        out[t] = stats[0] if stats else ""
    return out


def stage_quality_report(spark: SparkSession, stage_path: str) -> dict[str, int]:
    """Data-quality gate over the stage zone (the per-partition analog of
    the x_data_checks lake gate): key-field null counts, battery-voltage
    domain range, and duplicate delivery detection — ALL computed in one
    map-side-combined aggregate job, so the gate costs a single scan no
    matter how many constraints ride it.

    Returns ``{check_name: violation_count}`` (plain dict, foreachBatch-
    safe like pipeline_maintenance's report).
    """
    df = spark.read.parquet(stage_path)
    row = df.agg(
        F.count(F.when(F.col("deviceid").isNull(), 1)).alias("null_deviceid"),
        F.count(F.when(F.col("date_time").isNull(), 1)).alias("null_date_time"),
        F.count(
            F.when(
                F.col("battery_voltage").isNotNull()
                & ~F.col("battery_voltage").between(0.0, 100.0),
                1,
            )
        ).alias("battery_out_of_range"),
        (
            F.count("*")
            # struct() is never null, so null-keyed rows still count as
            # ONE delivery each (bare count_distinct would drop them and
            # overstate duplicates)
            - F.countDistinct(F.struct("deviceid", "packetid", "date_time"))
        ).alias("duplicate_deliveries"),
    ).first()
    return {k: int(row[k]) for k in row.asDict()}
