"""Adversarial-input robustness (Spark 4 ANSI mode ON): null/empty/
whitespace/unicode/huge documents and degenerate vectors must flow through
the dedup/text/similarity operators without ANSI exceptions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.functions.text import (
    doc_fingerprint,
    quality_score,
    token_count,
)
from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.operators import dedup as D
from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.operators.similarity import (
    cosine_topk,
)


@pytest.fixture(scope="module")
def weird_docs(spark):
    rows = [
        (1, None),
        (2, ""),
        (3, "   \n\t  "),
        (4, "héllo wörld 日本語 emoji 🎉 test"),
        (5, "single"),
        (6, "a b " * 5000),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_family_survives_weird_docs(weird_docs):
    # empty/whitespace docs share the "" shingle → they pair with each other
    pairs = D.minhash_near_dup(weird_docs).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(2, 3)}
    D.simhash_pairs(D.simhash_signatures(weird_docs)).collect()
    D.ngram_jaccard_pairs(weird_docs).collect()


def test_text_features_survive_weird_docs(weird_docs):
    feats = {
        r["doc_id"]: r
        for r in weird_docs.select(
            "doc_id",
            token_count("text").alias("tc"),
            quality_score("text").alias("q"),
            doc_fingerprint("text").alias("fp"),
        ).collect()
    }
    assert feats[1]["tc"] is None        # null text → null stats, no crash
    assert feats[2]["tc"] == 0
    assert feats[6]["tc"] == 10000
    assert feats[4]["fp"] is not None    # unicode fingerprints fine


def test_cosine_topk_degenerate_vectors_yield_null_not_crash(spark):
    """Zero-norm / null / empty embeddings must produce NULL similarity
    (try_divide), never an ANSI DIVIDE_BY_ZERO."""
    rows = [(1, [1.0, 0.0]), (2, None), (3, []), (4, [0.0, 0.0])]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_topk(vecs, vecs.filter(F.col("vec_id") == 1), k=3).collect()
    assert len(out) == 3
    assert all(r["sim"] is None for r in out)
