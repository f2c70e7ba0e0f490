"""Tests for tools/verify_sf1_staged.py — the staged DuckDB oracle
replayer that closed the last three sf1 gaps (SCALE.md §7p).

The replayer is load-bearing adjudication evidence, so its parser gets
the same bar as engine code: every registered oracle must split, and a
staged replay must reproduce the direct single-SQL replay bit-for-bit
on a dialect-diverse key sample (recursive CTE, MATERIALIZED hints,
window QUALIFY, list comprehensions).  DuckDB-only — no Spark session.
"""

from __future__ import annotations

import os
import sys
import tempfile

import duckdb
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

from verify_sf1_staged import split_with_chain, staged_oracle  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"

# dialect-diverse sample: recursive walk CTE + 23-stage chain (curate),
# generated oracle with self-join pyramid (triangle), MATERIALIZED hints
# (kcore), list-comprehension shingles + QUALIFY band guard (dedup_near),
# window-over-support-table statistics (mann_whitney)
SAMPLE = [
    "x_curate_corpus",
    "q_triangle_count",
    "x_kcore",
    "x_dedup_near",
    "x_mann_whitney",
]


def test_every_registered_oracle_parses():
    oracles = entrymod.oracle_sql()
    assert len(oracles) >= 226
    n_with = 0
    for key, sql in oracles.items():
        if not sql.strip().upper().startswith("WITH"):
            continue
        ctes, final = split_with_chain(sql)
        assert ctes, f"{key}: WITH-chain parsed to zero CTEs"
        assert final.strip(), f"{key}: empty final SELECT"
        names = [n for n, _, _ in ctes]
        assert len(names) == len(set(names)), f"{key}: duplicate CTE names"
        n_with += 1
    assert n_with >= 150  # the bulk of the registry is WITH-shaped


def test_parser_tracks_quotes_comments_and_collists():
    ctes, final = split_with_chain("""
    WITH RECURSIVE a AS (SELECT ')(' AS s, '' AS e -- (unbalanced ( in comment
      FROM t),
    w(n, l) AS (SELECT 1, 2 UNION ALL SELECT n + 1, l FROM w WHERE n < 3),
    m AS MATERIALIZED (SELECT * FROM a)
    SELECT * FROM m JOIN w ON true""")
    assert [n for n, _, _ in ctes] == ["a", "w", "m"]
    assert ctes[1][1].replace(" ", "") == "(n,l)"
    assert "')('" in ctes[0][2] and "comment" in ctes[0][2]
    assert ctes[2][2].strip() == "SELECT * FROM a"
    assert final.strip().startswith("SELECT")


@pytest.mark.parametrize("key", SAMPLE)
def test_staged_replay_equals_direct_single_sql(key):
    oracles = entrymod.oracle_sql()
    sql = oracles[key]
    with tempfile.TemporaryDirectory(prefix="staged_test_") as workdir:
        con = duckdb.connect()
        for t in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF_SMALL}/{t}.parquet'")
        direct = con.sql(sql)
        direct_cols = list(direct.columns)
        direct_rows = sorted(map(tuple, direct.fetchall()))
        rel = staged_oracle(con, sql, workdir, key, verbose=False)
        assert list(rel.columns) == direct_cols
        assert sorted(map(tuple, rel.fetchall())) == direct_rows
        con.close()
