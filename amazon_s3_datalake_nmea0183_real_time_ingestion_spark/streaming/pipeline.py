"""Structured Streaming ingest pipeline — the reference's full dataflow
(SURVEY.md §3.1–3.2, §7.1 M3; reference: hello.py:64-236 +
cdk_datalake_mvp_stack.py:160-253).

One ``StreamingQuery`` reproduces API Gateway → Firehose → Lambda → S3:

- **source**: file stream over a landing directory of JSON-line envelopes
  (stands in for Firehose DirectPut; declared ENVELOPE_SCHEMA, no infer).
- **trigger**: 60 s processing-time (Firehose 60 s buffer,
  cdk_datalake_mvp_stack.py:166); ``available_now`` for tests/backfill.
- **foreachBatch multi-sink** (the Lambda's per-batch contract,
  hello.py:26,194-199):
    1. three raw-zone JSON tees partitioned by *processing-time* y/m/d
       (hello.py:201-234),
    2. SOH branch → parse → geocode broadcast join → 30-col flatten →
       ``stage/`` parquet partitioned by *event-time* y/m/d
       (hello.py:140-175 + cdk_datalake_mvp_stack.py:206-214,228-238),
    3. unparseable SOH payloads → ``error/`` (Firehose error prefix,
       cdk_datalake_mvp_stack.py:213),
    4. threshold alerts → ``alerts/`` (hello.py:112-116,181-192; SNS in
       the reference is commented out),
    5. per-class counters logged (hello.py:56-58 flags).

Sensor/unknown rows are durable in raw zones but NEVER reach stage —
the reference appends only SOH records to the Firehose return
(hello.py:194-199); see SURVEY.md §7.4.3.

Scale notes (100 TB / 1000 executors): every per-batch transform is pure
column expressions inside whole-stage codegen; the only join is a
broadcast hash join against the ~65k-row geo dimension (no shuffle); the
stage sink shuffles once on the partition keys (repartition before write
so each micro-batch emits one file per event-day instead of
files × tasks).

Delivery semantics: the checkpoint guarantees each batch is processed
once under normal operation (no reprocessing across restarts, see
test_incremental_second_trigger). On a crash MID-batch, replay re-runs
all sinks of that batch — multi-sink appends are then at-least-once,
the same guarantee as the reference's Firehose retry
(cdk_datalake_mvp_stack.py:206-212); true multi-sink exactly-once would
need a transactional table format under every sink (SURVEY.md §7.4.1).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.datetime_fns import event_partition_cols, processing_partition_cols
from ..operators.alerts import alert_rows
from ..operators.classify import classify_records
from ..operators.flatten import flatten_soh, parse_soh_payload
from ..operators.geocode import build_geo_dim, enrich_geocode
from ..schemas import CLASS_SENSOR, CLASS_SOH, CLASS_UNKNOWN, ENVELOPE_SCHEMA


@dataclass
class PipelineBatchResult:
    """Per-class counters for one micro-batch (A22, hello.py:56-58)."""

    batch_id: int
    counts: dict[str, int] = field(default_factory=dict)


def read_landing_stream(
    spark: SparkSession,
    landing_dir: str,
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream source over JSON-line envelopes (A1 ``src_ingest``).

    ``maxBytesPerTrigger`` is the direct analog of Firehose's 64 MB size
    buffer (cdk_datalake_mvp_stack.py:167) — caps per-batch input VOLUME;
    ``maxFilesPerTrigger`` caps file COUNT (useful when landing files are
    uniform).  Both may be set; Spark applies whichever limit hits first."""
    reader = spark.readStream.schema(ENVELOPE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if max_bytes_per_trigger is not None:
        reader = reader.option("maxBytesPerTrigger", max_bytes_per_trigger)
    return reader.json(landing_dir)


def build_stage_rows(
    soh: DataFrame, geo_dim: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """SOH branch → (stage-ready 30-col rows + partition keys, error rows).

    A payload that fails ``from_json`` (null struct, or a partial parse
    with no ``d`` epoch — the event-partition key) is routed to error —
    the Spark analog of Firehose conversion failure → ``error/``."""
    parsed = parse_soh_payload(soh)
    bad = F.col("soh").isNull() | F.col("soh.d").isNull()
    errors = parsed.filter(bad).select("recordId", "msg_class", "payload_text")
    good = parsed.filter(~bad)
    enriched = enrich_geocode(good, geo_dim, lon_col="soh.ln", lat_col="soh.lt")
    stage = flatten_soh(enriched, geo_enriched=True)
    parts = event_partition_cols("date_time")
    stage = (
        stage.withColumn("year", parts["year"])
        .withColumn("month", parts["month"])
        .withColumn("day", parts["day"])
    )
    return stage, errors


def _write_raw_tee(cls_df: DataFrame, path: str, single_file: bool = False) -> None:
    """Raw-zone JSON tee partitioned by processing-time y/m/d
    (hello.py:52-62,201-234 — wall-clock ``now.strftime`` partitions).

    The default (``single_file=False``) keeps natural task parallelism —
    the scale-safe plan has no ``coalesce(1)``.  ``single_file=True`` is
    the reference-compat OPT-IN that mirrors the Lambda's
    one-upload-per-batch (hello.py:201-234); only sensible at
    Lambda-scale batch volumes (deliberate deviation, SURVEY.md §7.5
    style)."""
    parts = processing_partition_cols()
    out = (
        cls_df.withColumn("year", parts["year"])
        .withColumn("month", parts["month"])
        .withColumn("day", parts["day"])
    )
    if single_file:
        out = out.coalesce(1)
    (
        out.write.mode("append")
        .partitionBy("year", "month", "day")
        .json(path)
    )


def process_batch(
    batch: DataFrame,
    batch_id: int,
    lake_dir: str,
    geo_dim: DataFrame,
    reference_compat_raw_tee: bool = True,
    tee_single_file: bool = False,
    maintain_rollup: bool = False,
    stage_files_per_day: int = 1,
) -> PipelineBatchResult:
    """The foreachBatch body — the Lambda's records-in/records-out contract
    re-expressed as declarative multi-sink writes.

    ``stage_files_per_day`` fans the stage write out to N writer tasks
    (and so ≤ N files) per event-day partition per micro-batch.  The
    default 1 mirrors Firehose's one-object-per-buffer-flush at
    Lambda-scale volumes; at 100 TB/day a micro-batch concentrating on
    one or two event days would funnel the whole batch through one task
    per day — raise N so the day's volume spreads over N writers while
    file count stays bounded (N per day per batch, not files × tasks).
    The salt keys the repartition only; the directory layout (partitionBy
    year/month/day) is unchanged."""
    classified = classify_records(batch)
    classified.persist()
    try:
        counts = {
            r["msg_class"]: r["cnt"]
            for r in classified.groupBy("msg_class").agg(F.count("*").alias("cnt")).collect()
        }

        if reference_compat_raw_tee:
            for cls in (CLASS_SOH, CLASS_SENSOR, CLASS_UNKNOWN):
                cls_df = classified.filter(F.col("msg_class") == cls)
                if counts.get(cls, 0):
                    _write_raw_tee(cls_df.drop("msg_class", "payload_text"),
                                   os.path.join(lake_dir, "raw", cls),
                                   single_file=tee_single_file)

        soh = classified.filter(F.col("msg_class") == CLASS_SOH)
        stage, errors = build_stage_rows(soh, geo_dim)
        stage.persist()
        try:
            # one shuffle on the event-date keys (+ a bounded salt when
            # stage_files_per_day > 1) so each partition dir gets at most
            # stage_files_per_day files per micro-batch — avoids both the
            # files×tasks small-file explosion AND the one-task-per-day
            # writer bottleneck at scale
            if stage_files_per_day > 1:
                # per-ROW salt (packetid+hiverxtime+deviceid), not per-device:
                # a deviceid-keyed salt bounds fan-out by distinct devices per
                # day, so one hot device still funnels its whole day through a
                # single writer — the exact bottleneck this knob exists to fix
                to_write = stage.repartition(
                    "year", "month", "day",
                    F.pmod(
                        F.xxhash64("packetid", "hiverxtime", "deviceid"),
                        F.lit(stage_files_per_day),
                    ),
                )
            else:
                to_write = stage.repartition("year", "month", "day")
            (
                to_write.write.mode("append")
                .partitionBy("year", "month", "day")
                .parquet(os.path.join(lake_dir, "stage"))
            )
            alerts = alert_rows(stage.drop("year", "month", "day"))
            alerts.write.mode("append").parquet(os.path.join(lake_dir, "alerts"))
            if maintain_rollup:
                # continuous aggregate: refresh only the event-day
                # partitions this batch touched (idempotent under replay —
                # the rollup is recomputed from stage, not delta-merged)
                from ..sources.maintenance import refresh_rollup

                touched = [
                    (r["year"], r["month"], r["day"])
                    for r in stage.select("year", "month", "day").distinct().collect()
                ]
                refresh_rollup(
                    batch.sparkSession,
                    os.path.join(lake_dir, "stage"),
                    os.path.join(lake_dir, "rollup_daily_device"),
                    touched,
                )
        finally:
            stage.unpersist()

        if counts.get(CLASS_SOH, 0):
            errors.write.mode("append").json(os.path.join(lake_dir, "error"))
        return PipelineBatchResult(batch_id=batch_id, counts=counts)
    finally:
        classified.unpersist()


def start_pipeline(
    spark: SparkSession,
    landing_dir: str,
    lake_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int = 60,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: int | None = None,
    results: list[PipelineBatchResult] | None = None,
    tee_single_file: bool = False,
    maintain_rollup: bool = False,
    stage_files_per_day: int = 1,
    maintain_every_n_batches: int | None = None,
    maintenance_catalog_tables: list[str] | None = None,
    maintenance_reports: list[dict] | None = None,
    maintain_quality: bool = False,
    maintain_drift: bool = False,
    maintain_monitors: bool = False,
    geo_dim: DataFrame | None = None,
) -> StreamingQuery:
    """Wire source → foreachBatch → trigger → checkpoint and start.

    ``available_now=True`` drains the current landing-dir contents then
    stops (test/backfill mode); otherwise a 60 s processing-time trigger
    mirrors the Firehose buffer interval.

    ``maintain_every_n_batches=N`` runs ``pipeline_maintenance`` (schema
    drift LOG report on stage + partition recovery for
    ``maintenance_catalog_tables``) after every Nth batch — the in-stream
    analog of the reference's nightly crawler cron
    (cdk_datalake_mvp_stack.py:325); reports append to
    ``maintenance_reports``.  ``maintain_quality=True`` adds the
    one-scan stage data-quality gate (stage_quality_report) to each
    maintenance pass.  ``maintain_drift=True`` adds the PSI
    distribution-drift monitor (drift_psi_report): the FIRST maintenance
    pass persists the reference-period bucket profile under
    ``<lake>/maintenance/drift_profile``; every later pass scores the
    stage distribution against it and flags columns with PSI > 0.2.
    ``maintain_monitors=True`` adds the per-device CUSUM + MASE
    time-series monitors (timeseries_monitor_report — the maintenance
    twins of the batch x_cusum_changepoint / x_forecast_mase keys) to
    each pass: PSI says the DISTRIBUTION moved, CUSUM says the daily
    LEVEL sustained a shift, MASE says the volume stopped being
    forecastable.

    ``geo_dim`` lets callers running SEVERAL pipeline instances (see
    ``start_streams``) share one geocode dimension instead of rebuilding
    it per stream."""
    if geo_dim is None:
        geo_dim = build_geo_dim(spark)
    stream = read_landing_stream(
        spark, landing_dir, max_files_per_trigger, max_bytes_per_trigger
    )

    def _on_batch(batch: DataFrame, batch_id: int) -> None:
        res = process_batch(batch, batch_id, lake_dir, geo_dim,
                            tee_single_file=tee_single_file,
                            maintain_rollup=maintain_rollup,
                            stage_files_per_day=stage_files_per_day)
        if results is not None:
            results.append(res)
        if maintain_every_n_batches and (batch_id + 1) % maintain_every_n_batches == 0:
            from pyspark.sql.types import IntegerType, StructField, StructType

            from ..schemas import STAGE_SCHEMA
            from ..sources.maintenance import pipeline_maintenance

            declared = StructType(
                STAGE_SCHEMA.fields
                + [StructField(c, IntegerType()) for c in ("year", "month", "day")]
            )
            rep = pipeline_maintenance(
                batch.sparkSession,
                os.path.join(lake_dir, "stage"),
                declared,
                maintenance_catalog_tables,
                quality=maintain_quality,
                drift_profile_path=(
                    os.path.join(lake_dir, "maintenance", "drift_profile")
                    if maintain_drift
                    else None
                ),
                monitor_timeseries=maintain_monitors,
            )
            rep["batch_id"] = batch_id
            if maintenance_reports is not None:
                maintenance_reports.append(rep)

    writer = stream.writeStream.foreachBatch(_on_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def run_batch(
    spark: SparkSession, envelopes: DataFrame, lake_dir: str
) -> PipelineBatchResult:
    """Batch-mode equivalent of one micro-batch (backfill entry point)."""
    return process_batch(envelopes, batch_id=0, lake_dir=lake_dir,
                         geo_dim=build_geo_dim(spark))


# ---------------------------------------------------------------------------
# multi-stream ingest routing — the reference's ``POST /{stream-name}`` API
# route (cdk_datalake_mvp_stack.py:273-279,295): the path parameter selects
# the delivery stream, so one endpoint fans out to N independent Firehose
# streams.  Spark analog: one pipeline INSTANCE per stream name, each with
# its own landing / checkpoint / lake prefixes — checkpoints never cross,
# so each stream's exactly-once-per-batch progress is independent.
# ---------------------------------------------------------------------------

# API Gateway path-parameter discipline: a stream name is a single path
# segment, S3-prefix-safe.  Reject anything that could escape the prefix
# (separators, dots) BEFORE it reaches os.path.join.
_STREAM_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9_-]{0,63}$")


@dataclass(frozen=True)
class StreamRoute:
    """Filesystem layout for one named delivery stream under a shared
    base directory — the Spark analog of the per-stream Firehose
    delivery-stream + S3 prefix the CDK stack provisions per route."""

    stream_name: str
    landing_dir: str
    lake_dir: str
    checkpoint_dir: str


def stream_route(base_dir: str, stream_name: str) -> StreamRoute:
    """Resolve ``POST /{stream-name}`` to the stream's isolated prefixes.

    Producers append JSON-line envelope files under ``landing_dir`` (the
    DirectPut analog); the stream's pipeline owns ``lake_dir`` and
    ``checkpoint_dir``.  Raises ``ValueError`` for names that aren't a
    valid single path segment (the API Gateway path-param contract)."""
    if not _STREAM_NAME_RE.match(stream_name):
        raise ValueError(
            f"invalid stream name {stream_name!r}: must match "
            f"{_STREAM_NAME_RE.pattern} (single S3-prefix-safe path segment)"
        )
    return StreamRoute(
        stream_name=stream_name,
        landing_dir=os.path.join(base_dir, "landing", stream_name),
        lake_dir=os.path.join(base_dir, "lake", stream_name),
        checkpoint_dir=os.path.join(base_dir, "ckpt", stream_name),
    )


def start_streams(
    spark: SparkSession,
    base_dir: str,
    stream_names: list[str],
    results: dict[str, list[PipelineBatchResult]] | None = None,
    **pipeline_kwargs,
) -> dict[str, StreamingQuery]:
    """Start one independent pipeline per stream name (multi-fleet
    ingest).  Every stream gets its own landing/checkpoint/lake prefixes
    from :func:`stream_route`; the geocode dimension is built ONCE and
    shared (broadcast per batch regardless, so sharing costs nothing and
    saves N-1 dim builds).  ``results[name]`` collects per-batch counters
    when a dict is passed.  Remaining kwargs flow to
    :func:`start_pipeline` for every stream.

    Scale: streams are separate StreamingQuery instances scheduled
    concurrently by Spark; at cluster scale each stream's micro-batch
    jobs interleave on the shared executors (fair scheduler pools are
    the knob if one fleet must not starve another)."""
    routes = [stream_route(base_dir, name) for name in stream_names]
    if len({r.stream_name for r in routes}) != len(routes):
        raise ValueError(f"duplicate stream names in {stream_names!r}")
    geo_dim = build_geo_dim(spark)
    queries: dict[str, StreamingQuery] = {}
    for route in routes:
        os.makedirs(route.landing_dir, exist_ok=True)
        stream_results: list[PipelineBatchResult] | None = None
        if results is not None:
            stream_results = results.setdefault(route.stream_name, [])
        queries[route.stream_name] = start_pipeline(
            spark,
            route.landing_dir,
            route.lake_dir,
            route.checkpoint_dir,
            results=stream_results,
            geo_dim=geo_dim,
            **pipeline_kwargs,
        )
    return queries
