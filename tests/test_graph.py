"""pagerank(): exact values on a hand-computable graph + invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.operators.graph import (
    pagerank,
)


def _ranks(spark, edges, nodes, n_iter):
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "node long")
    out = pagerank(e, n, n_iter=n_iter, damping=0.85)
    return {r["node"]: r["r"] for r in out.collect()}


def test_pagerank_star_graph_exact(spark):
    # star: 1..4 each <-> 0 (undirected, both directions).  N=5.
    # leaves have deg 1 (-> hub), hub deg 4 (-> 1/4 to each leaf).
    edges = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    nodes = [0, 1, 2, 3, 4]
    d, n = 0.85, 5.0
    r_hub, r_leaf = 1 / n, 1 / n
    for _ in range(3):  # replay the recurrence in plain Python
        new_hub = (1 - d) / n + d * 4 * r_leaf  # leaves send all rank
        new_leaf = (1 - d) / n + d * (r_hub / 4)
        r_hub, r_leaf = new_hub, new_leaf
    got = _ranks(spark, edges, nodes, n_iter=3)
    assert got[0] == pytest.approx(r_hub, rel=1e-12)
    for leaf in (1, 2, 3, 4):
        assert got[leaf] == pytest.approx(r_leaf, rel=1e-12)


def test_pagerank_mass_conserved_without_dangling(spark):
    # a cycle has no dangling nodes: total rank must stay exactly 1
    edges = [(i, (i + 1) % 6) for i in range(6)]
    got = _ranks(spark, edges, list(range(6)), n_iter=4)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-12)
    # symmetric structure -> uniform ranks
    for v in got.values():
        assert v == pytest.approx(1 / 6, rel=1e-12)


def test_pagerank_isolated_node_keeps_teleport_only(spark):
    edges = [(0, 1), (1, 0)]
    got = _ranks(spark, edges, [0, 1, 2], n_iter=2)
    assert got[2] == pytest.approx(0.15 / 3, rel=1e-12)
    assert got[0] == got[1] > got[2]
