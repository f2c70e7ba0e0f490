"""Multimodal columns (SURVEY.md §2 Tier C5): opaque ``binary`` payloads +
typed metadata structs, with Arrow-batched feature extraction.

Design for 100 TB:
- assets are rows of (id, modality, payload binary, meta struct) — the
  payload is NEVER interpreted by Catalyst, so scans prune it unless a
  stage actually needs bytes;
- decode / feature-extraction runs through ``mapInPandas`` (Arrow batch
  transfer, one Python worker per core, zero per-row overhead) and each
  batch yields a columnar frame;
- heavyweight decoders (image/audio/video) are STUBBED here — the
  container has no codec libraries — behind ``NotImplementedError`` with a
  deterministic byte-level fake, but the Spark-side plumbing (schema,
  batching, partition preservation) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("first_byte", IntegerType()),
        StructField("byte_sum_mod", LongType()),
    ]
)


def pack_assets(docs: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Pack text + metadata + vector into one typed multimodal row:
    (asset_id, modality, payload binary, meta struct, vector)."""
    joined = docs.join(
        embeddings, docs.doc_id == embeddings.vec_id, "inner"
    )
    return joined.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.col("lang"), F.col("source"), F.col("n_chars"), F.col("label")
        ).alias("meta"),
        F.col("embedding").alias("vector"),
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched byte-level feature extraction over the binary payload.

    This is the sanctioned pattern for decode/resize/frame-sample stages:
    per-batch vectorized Python, schema declared up front, no driver
    round-trip.  Real image decode would replace `_fake_decode`.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            # feature fake is defined over the decoded text's CODE POINTS
            # (not raw UTF-8 bytes) so the SQL oracle can reproduce it
            # exactly with unicode(); n_bytes stays a true byte length.
            texts = payloads.map(lambda b: bytes(b).decode("utf-8"))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "first_byte": texts.map(lambda t: ord(t[0]) if t else -1).astype("int32"),
                    "byte_sum_mod": texts.map(
                        lambda t: sum(ord(c) for c in t) % 997
                    ).astype("int64"),
                }
            )

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        _batches, ASSET_FEATURE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(assets: DataFrame, frame_size: int = 64,
                  every_n: int = 4) -> DataFrame:
    """Frame sampling (video-style one-to-many): slice each payload into
    fixed-size frames and keep every ``every_n``-th.

    A real video pipeline swaps the byte-slicing for a container demuxer;
    the Spark shape is identical: ``mapInPandas`` where one input row
    yields MANY output rows (Arrow batches both ways), payload column
    pruned everywhere the frames aren't needed.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, totals, frames = [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                n_frames = max((len(payload) + frame_size - 1) // frame_size, 1)
                for i in range(0, n_frames, every_n):
                    ids.append(aid)
                    idxs.append(i)
                    totals.append(n_frames)
                    frames.append(bytes(payload[i * frame_size:(i + 1) * frame_size]))
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": pd.array(idxs, dtype="int32"),
                 "n_frames": pd.array(totals, dtype="int32"), "frame": frames}
            )

    return assets.select("asset_id", "payload").mapInPandas(_batches, FRAME_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", IntegerType()),
    ]
)


def resize_assets(assets: DataFrame, target_bytes: int = 256) -> DataFrame:
    """Resize stage: deterministic byte-stride downsample to exactly
    ``target_bytes`` (payloads shorter than the target pass through).
    A real image pipeline swaps the stride for PIL/libvips resize inside
    the same batch loop — schema and batching stay as-is."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def _shrink(b: bytes) -> bytes:
                if len(b) <= target_bytes:
                    return bytes(b)
                idx = [int(i * len(b) / target_bytes) for i in range(target_bytes)]
                return bytes(bytearray(b[i] for i in idx))

            resized = pdf["payload"].map(_shrink)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "payload": resized,
                    "n_bytes": resized.map(len).astype("int32"),
                }
            )

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        _batches, RESIZED_SCHEMA
    )


def decode_image(payload: bytes) -> dict:
    """Image decode stub — codec libraries are not available in this
    container.  The real implementation would return width/height/pixels
    via PIL/libvips inside the `extract_features` batch loop."""
    raise NotImplementedError(
        "image decode requires codec libraries not present in this environment; "
        "use extract_features() byte-level features or plug a decoder in here"
    )
