"""Incremental corpus dedup against a persistent fingerprint ledger.

The batch/streaming shape a continuously-crawled training corpus needs:
each new micro-batch is admitted only if its document fingerprint has
never been seen in ANY prior batch, and admitted fingerprints are
appended to a durable ledger so the check survives restarts.  This is
the historical-store complement of ``operators.dedup.exact_dedup``
(within-dataset) and ``streaming.stateful.streaming_dedup`` (within the
watermark horizon): the ledger has no horizon.

Reference parity: the reference lands every record append-only via
Firehose (cdk_datalake_mvp/cdk_datalake_mvp_stack.py:150-170) and leaves
dedup to Athena readers; a training pipeline must dedup at admission
instead.

Scale design (100 TB): the ledger holds ONE narrow row (fp, doc_id,
batch_id) per unique document ever admitted — a few % of corpus bytes.
The anti-join shuffles fingerprints, not documents: new-batch fps are
first deduped in-batch (map-side combine), then LEFT ANTI joined against
the ledger scan; Spark's runtime bloom-filter join pushes a membership
filter below the ledger scan when sizes warrant.  The per-batch-id
partition layout makes replays overwrite themselves (exactly-once per
batch id, the same dynamic-partition-overwrite idempotency contract as
sources.maintenance.refresh_rollup), and gives partition pruning on
re-crawl audits.  On a real lakehouse the ledger would be an
Iceberg/Delta table MERGEd by fp; plain parquet keeps the container
dependency-free while the join/overwrite shape is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint
from .dedup import SIMHASH_BITS, simhash_pairs, simhash_signatures

LEDGER_SCHEMA = "fp string, doc_id bigint, batch_id bigint"


def _read_ledger(spark: SparkSession, ledger_path: str) -> DataFrame:
    if os.path.isdir(ledger_path):
        return spark.read.schema(LEDGER_SCHEMA).parquet(ledger_path).select(
            "fp", "doc_id", "batch_id"
        )
    return spark.createDataFrame([], LEDGER_SCHEMA)


def admit_new_documents(
    spark: SparkSession,
    batch: DataFrame,
    ledger_path: str,
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Return the subset of ``batch`` never seen before; record it.

    Within-batch ties keep the lowest ``id_col`` (deterministic).  Rows
    whose fingerprint is already in the ledger are dropped.  Admitted
    ``(fp, doc_id, batch_id)`` rows are written to
    ``ledger_path/batch_id=N/`` with dynamic partition overwrite, so
    re-running a failed/replayed batch id is exactly-once: the partition
    is replaced, never duplicated.

    A replayed batch id is admitted against the ledger EXCLUDING its own
    prior partial write (otherwise a replay would reject every row it
    admitted before the crash and emit an empty batch downstream).
    """
    fp = doc_fingerprint(text_col)
    in_batch = (
        batch.withColumn("fp", fp)
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
    )
    ledger = _read_ledger(spark, ledger_path).filter(
        F.col("batch_id") != F.lit(batch_id)
    )
    fresh = in_batch.join(ledger.select("fp"), "fp", "left_anti")
    entries = fresh.select(
        "fp", F.col(id_col).cast("long").alias("doc_id"),
        F.lit(batch_id).cast("long").alias("batch_id"),
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        entries.write.mode("overwrite").partitionBy("batch_id").parquet(ledger_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # admitted full rows: semi-join original batch on the surviving ids
    # (dropDuplicates guards against literal row replays inside one batch)
    return batch.join(
        fresh.select(F.col(id_col).alias("__keep_id")),
        F.col(id_col) == F.col("__keep_id"),
        "left_semi",
    ).dropDuplicates([id_col])


NEAR_LEDGER_SCHEMA = "doc_id bigint, simhash bigint, batch_id bigint"


def _read_near_ledger(spark: SparkSession, ledger_path: str) -> DataFrame:
    if os.path.isdir(ledger_path):
        return spark.read.schema(NEAR_LEDGER_SCHEMA).parquet(ledger_path).select(
            "doc_id", "simhash", "batch_id"
        )
    return spark.createDataFrame([], NEAR_LEDGER_SCHEMA)


def _banded(sigs: DataFrame, n_bands: int) -> DataFrame:
    """Explode a (doc_id, simhash) frame into its LSH band slices — the
    same bit-slice banding as :func:`operators.dedup.simhash_pairs`, so
    ledger admission and within-corpus pair-finding agree on candidates."""
    chunk = SIMHASH_BITS // n_bands
    mask = (1 << chunk) - 1
    return sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.shiftright("simhash", b * chunk).bitwiseAND(F.lit(mask)).alias("band_val"),
                )
                for b in range(n_bands)
            ])
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band_id", "bb.band_val")


def admit_near_new_documents(
    spark: SparkSession,
    batch: DataFrame,
    ledger_path: str,
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 4,
    max_hamming: int = 8,
    _pinned: list | None = None,
) -> DataFrame:
    """Cross-batch NEAR-dup admission: the SimHash-band complement of
    :func:`admit_new_documents` (which only catches byte-identical text).

    ``_pinned`` (ADVICE r14, streaming callers): when given, the two
    intermediate cuts use ``persist(DISK_ONLY)`` instead of
    ``localCheckpoint`` and the pinned frames are appended to the list so
    the caller can ``unpersist()`` them after consuming the admitted
    batch — localCheckpoint blocks are only freed by driver-side GC, so a
    long stream of micro-batches accumulates executor storage.  Batch
    callers keep the default (localCheckpoint truncates lineage AND dies
    with the session).

    A batch document is admitted iff
    1. no in-batch document with a SMALLER id is a near-dup of it
       (band collision + Hamming ≤ ``max_hamming`` — the deterministic
       one-pass "keep-min" rule; survivors of rule 1 are checked against
       the ledger regardless of whether their smaller partner survived), and
    2. no document admitted by ANY prior batch collides in a band within
       ``max_hamming`` (the ledger stores one (doc_id, simhash, batch_id)
       row per admitted doc).

    Scale design: the ledger row is 24 bytes/doc; admission shuffles
    signatures (|batch| × n_bands band rows joined against |ledger| ×
    n_bands), never text.  Replay-safety matches the exact ledger: the
    check EXCLUDES the replaying batch id's own partition and the write
    dynamic-overwrites it."""
    if SIMHASH_BITS % n_bands != 0:
        raise ValueError(f"n_bands={n_bands} must divide SIMHASH_BITS={SIMHASH_BITS}")

    def _cut(df: DataFrame) -> DataFrame:
        if _pinned is None:
            return df.localCheckpoint(eager=False)
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.DISK_ONLY)
        _pinned.append(df)
        return df

    sigs = simhash_signatures(batch, id_col=id_col, text_col=text_col)
    if id_col != "doc_id":
        sigs = sigs.withColumnRenamed(id_col, "doc_id")
    # signature computation (tokenize + distinct + 20 packed bit-sums) is
    # the expensive stage and feeds THREE consumers below (the in-batch
    # pair join's two sides via simhash_pairs, and the survivors
    # anti-join) — materialize it once, lazily (r14, guide §5 caching:
    # reused AND expensive to recompute; same localCheckpoint economics
    # and executor-loss caveat as connected_components' default mode —
    # production at 100 TB uses persist(DISK_ONLY) for replayable loss).
    sigs = _cut(sigs)
    # rule 1 — drop any doc with a smaller in-batch near-dup partner
    pairs = simhash_pairs(sigs, n_bands=n_bands, max_hamming=max_hamming)
    survivors = sigs.join(
        pairs.select(F.col("id_b").alias("doc_id")).distinct(), "doc_id", "left_anti"
    )
    # rule 2 — band join against every OTHER batch's admitted signatures
    ledger = _read_near_ledger(spark, ledger_path).filter(
        F.col("batch_id") != F.lit(batch_id)
    )
    hits = (
        _banded(survivors, n_bands)
        .join(
            _banded(ledger.select("doc_id", "simhash"), n_bands)
            .select("band_id", "band_val", F.col("simhash").alias("led_sh")),
            ["band_id", "band_val"],
        )
        .filter(F.bit_count(F.col("simhash").bitwiseXOR(F.col("led_sh"))) <= max_hamming)
        .select("doc_id")
        .distinct()
    )
    # the ledger write below materializes the admission pipeline; without
    # this cut the RETURNED semi-join replans the whole pipeline (band
    # join + ledger anti-join included) a second time when the caller
    # materializes the admitted batch (r14 — measured as the dominant
    # cost of x_dedup_ledger_near's second batch).
    admitted = _cut(survivors.join(hits, "doc_id", "left_anti"))
    entries = admitted.select(
        "doc_id", "simhash", F.lit(batch_id).cast("long").alias("batch_id")
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        entries.write.mode("overwrite").partitionBy("batch_id").parquet(ledger_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return batch.join(
        admitted.select(F.col("doc_id").alias("__keep_id")),
        F.col(id_col) == F.col("__keep_id"),
        "left_semi",
    ).dropDuplicates([id_col])


def start_near_dedup_stream(
    stream: DataFrame,
    ledger_path: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 4,
    max_hamming: int = 8,
    available_now: bool = True,
):
    """Streaming near-dup admission control (foreachBatch around
    :func:`admit_near_new_documents`); appends admitted docs to
    ``out_path``."""

    def _admit(batch: DataFrame, batch_id: int) -> None:
        # per-batch persist + explicit unpersist (ADVICE r14): a long
        # stream must not accumulate storage blocks across micro-batches
        pinned: list[DataFrame] = []
        admitted = admit_near_new_documents(
            batch.sparkSession, batch, ledger_path, batch_id,
            id_col=id_col, text_col=text_col,
            n_bands=n_bands, max_hamming=max_hamming, _pinned=pinned,
        )
        try:
            admitted.write.mode("append").parquet(out_path)
        finally:
            for df in pinned:
                df.unpersist()

    writer = stream.writeStream.foreachBatch(_admit).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_dedup_stream(
    stream: DataFrame,
    ledger_path: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Streaming admission control: foreachBatch wrapper around
    :func:`admit_new_documents` that appends admitted documents to
    ``out_path``.  Checkpointed source offsets + per-batch-id ledger
    partitions give end-to-end exactly-once admission."""

    def _admit(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        admitted = admit_new_documents(
            spark, batch, ledger_path, batch_id, id_col=id_col, text_col=text_col
        )
        admitted.write.mode("append").parquet(out_path)

    writer = stream.writeStream.foreachBatch(_admit).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
