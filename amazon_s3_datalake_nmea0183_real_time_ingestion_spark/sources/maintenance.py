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


def pipeline_maintenance(
    spark: SparkSession,
    stage_path: str,
    declared: StructType,
    catalog_tables: list[str] | None = None,
    quality: bool = False,
) -> dict:
    """One scheduled-maintenance pass — the in-engine analog of the
    reference's nightly crawler run (``cron(0 4 * * ? *)``,
    cdk_datalake_mvp_stack.py:325): discover new partitions for registered
    tables and LOG (never apply) schema drift on the stage zone.

    Returns ``{"drift": [(column, declared, observed, status), ...],
    "drift_status_counts": {...}, "recovered_tables": [...]}`` — a plain
    dict so foreachBatch callers can append it to a report list without
    touching Spark objects after the batch.
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
