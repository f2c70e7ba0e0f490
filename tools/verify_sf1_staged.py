#!/usr/bin/env python
"""Staged DuckDB oracle replay for sf1-scale adjudication (VERDICT r9 #3).

The registered oracles are single WITH-chains; at sf1 the composed keys
(``x_curate_corpus``, ``q_triangle_count``) spill DuckDB past the host's
~80 GB free temp disk when replayed as ONE query (SCALE.md §7o).  This
tool replays the SAME oracle SQL stage-by-stage:

1. parse the registered oracle's WITH-chain into its CTE list (a
   paren/quote-aware split — the text of every stage is the registered
   oracle's text VERBATIM, so the replay cannot drift from the gate);
2. materialize each CTE to a temp parquet in dependency order, turning
   it into a view over the file, so each stage's body runs against
   views of the previously-materialized stages — peak DuckDB state is
   ONE stage, not the whole pipeline;
3. run the final SELECT over the views and compare against the engine's
   Spark result with the exact verify_local hash rules.

Recursive CTEs (the ``walk`` label propagation) self-reference; those
run un-staged as ``WITH RECURSIVE name AS (body) SELECT * FROM name``
over the already-materialized upstream views — the recursion's working
set is label-table-sized, never corpus-sized.

``--agg`` keys compare WITHOUT collecting: row count plus a commutative
per-row md5 sum computed inside each engine.  Criteria for using --agg:
(a) the key's output is too large to collect at sf1 — quadratic-output
keys (pair lists like x_dedup_simhash's 164M implied pairs) or keys
whose collect-compare harness cost dominates the gate (q_unpivot's
24M-row / 181 s collect in r11, SCALE.md §7r); AND
(b) every output column encodes identically cross-engine:
  - integer/boolean/string/DATE stringify bit-identically — used raw;
  - DOUBLE uses the repo's 4dp fixed-point float convention:
    ``floor(v * 10000)`` as BIGINT, NaN → 'NULL' and ±inf → 'inf'/'-inf'
    (mirroring verify_local._norm_cell), finite |v| >= 9e14 refused by a
    range check riding the SAME single hash pass in BOTH engines (v*1e4
    must stay under 2^63 for the ANSI cast; such cells take an 'OOR'
    sentinel and the tainted hash is discarded before comparison).  The multiply+floor is the SAME IEEE op on the SAME bits in
    both engines, so equal inputs always hash equal; the trade is that
    doubles agreeing to 4dp but differing beyond are NOT distinguished —
    so a double column is only agg-eligible when it is a pure projection
    of base-table data (bit-identical by construction; q_unpivot's
    ``val``) or an already-ROUNDed aggregate (the 4dp convention);
  - timestamps and decimals stay collect-only (TypeError guard).
Under ``--all``, collect-based keys are additionally row-count-capped
(``ROW_CEILING`` env, default 10M): a future large-output key fails with
an "add to AGG_KEYS" hint instead of an opaque driver OOM (ADVICE r11).

``--all`` is the STANDING sf1 GATE (VERDICT r10 #5): it replays every
registry key through this staged loop — collect-based compare by
default, switching to the commutative-hash compare automatically for
the keys in ``AGG_KEYS`` — so the SCALE.md "226/226 at sf1"
certification line is ONE command.  A resume after an interruption is
the same command with the not-yet-reported keys listed explicitly.

If the local-mode Spark JVM dies mid-run (an executor heap OOM in local
mode kills the WHOLE JVM and its py4j gateway), the tool revives the
session and retries the key once on a fresh heap, so one OOM costs one
retry, not the remaining keys of a 226-key sweep (r12 live finding: one
q_triangle_count OOM at the 8g default cascaded 55 downstream keys as
ConnectionRefusedError before this guard existed).  For the full --all
sweep at sf1, give the session headroom up front:
``SPARK_GRAFT_DRIVER_MEM=24g`` (the box's 128 GiB fits this next to
DuckDB's 48 GB limit with a wide margin).

Usage: python tools/verify_sf1_staged.py x_curate_corpus q_triangle_count
       python tools/verify_sf1_staged.py --agg x_dedup_simhash
       SPARK_GRAFT_DRIVER_MEM=24g python tools/verify_sf1_staged.py --all
       SF_DIR=.scratch/sf1 MEM=48GB python tools/verify_sf1_staged.py ...
"""

from __future__ import annotations

import os
import re
import shutil
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from verify_local import _col_order, _hash_rows, _norm_cell  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", os.path.join(os.path.dirname(_HERE), ".scratch", "sf1"))
MEM = os.environ.get("MEM", "48GB")


# ---------------------------------------------------------------------------
# WITH-chain parser
# ---------------------------------------------------------------------------

_CTE_HEAD = re.compile(
    r"\s*([A-Za-z_][A-Za-z0-9_]*)\s*(\([^)]*\))?\s+AS\s+(?:MATERIALIZED\s*)?\(",
    re.IGNORECASE,
)


def split_with_chain(sql: str) -> tuple[list[tuple[str, str, str]], str]:
    """Split ``WITH [RECURSIVE] a AS (...), b(...) AS (...) SELECT ...``
    into ``([(name, collist, body), ...], final_select)``.

    Paren depth + single-quote tracking only — the oracle dialect never
    uses dollar quoting or backslash escapes; doubled '' quotes toggle
    the in-string flag twice, which nets out correctly."""
    s = sql.strip()
    m = re.match(r"(?is)^\s*WITH\s+(RECURSIVE\s+)?", s)
    if not m:
        return [], s
    body = s[m.end():]
    ctes: list[tuple[str, str, str]] = []
    i = 0
    while True:
        h = _CTE_HEAD.match(body, i)
        if not h:
            raise ValueError(f"expected CTE head at: {body[i:i+80]!r}")
        name, collist = h.group(1), h.group(2) or ""
        j = h.end()
        depth, k, in_str = 1, j, False
        while depth:
            c = body[k]
            if in_str:
                if c == "'":
                    in_str = False
            elif c == "'":
                in_str = True
            elif c == "-" and body[k:k + 2] == "--":
                nl = body.find("\n", k)  # -- comment: parens don't count
                if nl == -1:
                    # comment swallows the rest of the text while parens
                    # are still open — fail with context, not index()'s
                    # bare ValueError
                    raise ValueError(
                        f"CTE {name!r}: unterminated -- comment while "
                        f"{depth} paren(s) open: {body[k:k+80]!r}"
                    )
                k = nl
            elif c == "/" and body[k:k + 2] == "/*":
                # block comments are NOT tracked (a paren inside one would
                # silently corrupt the split): reject loudly — the oracle
                # dialect uses -- comments only
                raise ValueError(
                    f"CTE {name!r}: /* */ block comments are unsupported "
                    f"by the staged-replay parser: {body[k:k+80]!r}"
                )
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        ctes.append((name, collist, body[j:k - 1]))
        m2 = re.match(r"\s*,", body[k:])
        if not m2:
            return ctes, body[k:]
        i = k + m2.end()


# ---------------------------------------------------------------------------
# staged execution
# ---------------------------------------------------------------------------


# Single source of truth for the driver-registered base tables: used both
# for view creation in main() and for the CTE-name clash guard below —
# a table added to one list but not the other would leave the guard
# silently blind (ADVICE r10 #2).
BASE_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)
_BASE_TABLES = frozenset(BASE_TABLES)


def staged_oracle(con, sql: str, workdir: str, key: str, verbose: bool = True,
                  created_views: list[str] | None = None):
    """Materialize each CTE of ``sql`` to parquet-in-``workdir`` in order,
    then return the DuckDB relation of the final SELECT over the views.

    CTE names are asserted disjoint from the base-table names: CREATE OR
    REPLACE VIEW on a shared connection would otherwise CLOBBER a base
    view for every later key in the run (no current oracle does this —
    the assert keeps it impossible).  Pass ``created_views`` to collect
    the view names for per-key cleanup."""
    ctes, final = split_with_chain(sql)
    clash = [n for (n, _, _) in ctes if n.lower() in _BASE_TABLES]
    if clash:
        raise ValueError(
            f"{key}: CTE name(s) {clash} collide with base-table views — "
            "staging would clobber the base relation for later keys"
        )
    for idx, (name, collist, body) in enumerate(ctes):
        t0 = time.time()
        path = os.path.join(workdir, f"{key}_{idx:02d}_{name}.parquet")
        if collist or re.search(rf"\b{re.escape(name)}\b", body, re.IGNORECASE):
            q = f"WITH RECURSIVE {name}{collist} AS ({body}) SELECT * FROM {name}"
        else:
            q = body
        # Parquet has no int128, so DuckDB writes HUGEINT stage columns
        # (every sum() over BIGINT!) as DOUBLE — which silently changes
        # SEMANTICS downstream, not just types: `//` on DOUBLE is plain
        # division (13298.0 // 512 = 25.97…) and CAST(… AS INT) then
        # ROUNDS where integer `//` floors (caught live by
        # x_pack_sequences at sf1: pack_id off by one at half-window
        # boundaries).  Restore the original type on the view so every
        # later stage sees the exact relation the inline CTE produced.
        hug_cols = {
            c: typ.upper()
            for (c, typ, *_) in con.sql(f"DESCRIBE ({q})").fetchall()
            if typ.upper() in ("HUGEINT", "UHUGEINT")
        }
        con.sql(f"COPY ({q}) TO '{path}' (FORMAT PARQUET)")
        if hug_cols:
            # the DOUBLE round-trip is value-exact only below 2^53 — a
            # genuinely huge rank-sum would come back corrupted, so fail
            # LOUDLY instead of re-verifying garbage.  Checked against
            # the parquet BEFORE creating the view: raising afterwards
            # would leak an un-tracked view on the shared connection
            # that outlives its per-key backing files (review r11).
            checks = ", ".join(
                f'max(abs(CAST("{c}" AS DOUBLE))) AS "{c}"' for c in hug_cols
            )
            mx = con.sql(
                f"SELECT {checks} FROM read_parquet('{path}')"
            ).fetchone()
            too_big = [c for c, v in zip(hug_cols, mx)
                       if v is not None and v >= 2.0 ** 53]
            if too_big:
                raise ValueError(
                    f"{key}: stage {name!r} HUGEINT column(s) {too_big} "
                    "exceed 2^53 — the parquet DOUBLE round-trip is lossy "
                    "here; this stage cannot be replayed staged"
                )
            # restore the ORIGINAL type (UHUGEINT stays unsigned — a
            # signed restore would flip underflow semantics downstream)
            proj = ", ".join(
                f'CAST("{c}" AS {hug_cols[c]}) AS "{c}"' if c in hug_cols
                else f'"{c}"'
                for (c, *_r) in con.sql(
                    f"DESCRIBE SELECT * FROM read_parquet('{path}')"
                ).fetchall()
            )
            con.sql(
                f"CREATE OR REPLACE VIEW {name} AS "
                f"SELECT {proj} FROM read_parquet('{path}')"
            )
        else:
            con.sql(
                f"CREATE OR REPLACE VIEW {name} AS "
                f"SELECT * FROM read_parquet('{path}')"
            )
        if created_views is not None:
            created_views.append(name)
        if verbose:
            n = con.sql(f"SELECT count(*) FROM {name}").fetchone()[0]
            mb = os.path.getsize(path) / 1e6
            print(f"    [{key}] stage {idx:02d} {name}: {n} rows, "
                  f"{mb:.1f} MB, {time.time()-t0:.1f}s", flush=True)
    return con.sql(final)


# ---------------------------------------------------------------------------
# in-engine commutative hash (integer-output keys; no collect on either side)
# ---------------------------------------------------------------------------


# Cell types whose CAST-to-string form is bit-identical on Spark and
# DuckDB: integers, booleans, strings, and DATEs (both stringify ISO
# '1992-01-01'; ADVICE r10 #1).  DOUBLE is handled by the 4dp
# fixed-point encoding below (raw stringification differs: '1.0E20' vs
# '1e+20', 'NaN' vs 'nan'); decimals and timestamps stay excluded
# ('2024-01-01 00:00:00' vs fractional-second variants across casts).
_INT_TYPES = {"tinyint", "smallint", "int", "bigint", "boolean", "string",
              "date"}

# finite |v| must keep v*1e4 under 2^63 for the ANSI BIGINT cast; the
# bound is conservative (9e18 < 2^63 = 9.223e18) for the same reason the
# Benford monitor's is — a double near the cast boundary can round UP
# across it
_DBL_ABS_MAX = 9.0e14


def spark_agg_hash(sdf) -> tuple[int, int]:
    from pyspark.sql import functions as F

    # the commutative-hash compare encodes cells INSIDE each engine;
    # enforce the docstring's dtype restriction instead of trusting it
    bad = [(c, t) for c, t in sdf.dtypes
           if t not in _INT_TYPES and t != "double"]
    if bad:
        raise TypeError(
            f"--agg compare is integer/string/double-output only; got {bad} "
            "— cross-engine stringification differs, use the "
            "collect-based compare for this key"
        )
    dbl = [c for c, t in sdf.dtypes if t == "double"]

    def cell(c: str, t: str):
        if t == "double":
            v = F.col(c)
            # mirrors verify_local._norm_cell: NaN → 'NULL', ±inf →
            # 'inf'/'-inf' — NaN-as-'NULL' is the DOCUMENTED SHARED
            # CONVENTION with duck_agg_hash and the collect path
            # (ADVICE r12 #4): a cross-engine NULL↔NaN swap in a double
            # column is invisible to this compare by design; if an
            # AGG_KEYS candidate ever needs NULL/NaN fidelity, encode
            # NaN as a distinct 'NaN' label in BOTH engines instead.
            # finite → floor(v*1e4) (same IEEE multiply +
            # floor on the same bits in both engines, so equal inputs
            # always encode equal).  Finite |v| >= _DBL_ABS_MAX takes
            # the 'OOR' sentinel INSTEAD of the ANSI-overflowing cast,
            # so the range check can ride the same single pass as the
            # hash (review r12): the max-of-finite-abs below is
            # validated BEFORE any hash is compared, so an OOR-tainted
            # hash is never used.
            return F.coalesce(
                F.when(F.isnan(v), F.lit("NULL"))
                .when(v == F.lit(float("inf")), F.lit("inf"))
                .when(v == F.lit(float("-inf")), F.lit("-inf"))
                .when(F.abs(v) >= F.lit(_DBL_ABS_MAX), F.lit("OOR"))
                .otherwise(F.floor(v * F.lit(10000.0)).cast("string")),
                F.lit("NULL"),
            )
        return F.coalesce(F.col(c).cast("string"), F.lit("NULL"))

    types = dict(sdf.dtypes)
    cols = [sdf.columns[i] for i in _col_order(list(sdf.columns))]
    cells = [cell(c, types[c]) for c in cols]
    # first 15 hex chars of md5 -> non-negative BIGINT, summed exactly;
    # the per-double finite-max range checks share this one pass
    finite_max = [
        F.max(
            F.when(
                ~F.isnan(F.col(c)) & (F.abs(F.col(c)) != F.lit(float("inf"))),
                F.abs(F.col(c)),
            )
        ).alias(f"__mx_{c}")
        for c in dbl
    ]
    rowh = F.conv(F.substring(F.md5(F.concat_ws("|", *cells)), 1, 15), 16, 10)
    agg = sdf.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(rowh.cast("decimal(38,0)")).alias("h"),
        *finite_max,
    ).collect()[0]
    too_big = [
        c for c in dbl
        if agg[f"__mx_{c}"] is not None and agg[f"__mx_{c}"] >= _DBL_ABS_MAX
    ]
    if too_big:
        raise ValueError(
            f"--agg double column(s) {too_big} hold finite values >= "
            f"{_DBL_ABS_MAX:.0e} — the 4dp fixed-point encoding would "
            "overflow the ANSI BIGINT cast; use the collect compare"
        )
    return int(agg["n"]), int(agg["h"] or 0)


# DuckDB-side mirror of spark_agg_hash's _INT_TYPES: types whose CAST
# to VARCHAR matches Spark's string form bit-for-bit.  HUGEINT/UHUGEINT
# are included (integer text is engine-independent; the staged views
# deliberately restore HUGEINT on summed BIGINT columns) — a HUGEINT
# final column pairs with a Spark DECIMAL(38,0), which the SPARK-side
# guard rejects, so the pair still can't silently pass.
_DUCK_AGG_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                   "UHUGEINT", "UTINYINT", "USMALLINT", "UINTEGER",
                   "UBIGINT", "BOOLEAN", "VARCHAR", "DATE", "DOUBLE"}


def duck_agg_hash(con, from_clause: str, cols: list[str]) -> tuple[int, int]:
    types = {
        c: t.upper()
        for (c, t, *_r) in con.sql(
            f"DESCRIBE SELECT * FROM {from_clause}"
        ).fetchall()
    }
    # ADVICE r12 #1: mirror spark_agg_hash's dtype guard so a
    # TIMESTAMP/DECIMAL output fails HERE — attributed to the agg-hash
    # contract, before a full hash scan — instead of being raw-
    # stringified ('2024-01-01 00:00:00' vs Spark's cast variants) and
    # surfacing later as a misattributed Spark-phase mismatch.
    bad = [(c, types[c]) for c in cols if types[c] not in _DUCK_AGG_TYPES]
    if bad:
        raise TypeError(
            f"--agg compare is integer/string/double-output only; got {bad} "
            "— cross-engine stringification differs, use the "
            "collect-based compare for this key"
        )
    dbl = [c for c in cols if types[c] == "DOUBLE"]

    def cell(c: str) -> str:
        if types[c] == "DOUBLE":
            # same when-chain as the Spark side, 'OOR' sentinel
            # included so the single-pass range check below can't be
            # pre-empted by a BIGINT cast overflow
            return (
                f"coalesce(CASE WHEN isnan({c}) THEN 'NULL' "
                f"WHEN {c} = 'infinity'::DOUBLE THEN 'inf' "
                f"WHEN {c} = '-infinity'::DOUBLE THEN '-inf' "
                f"WHEN abs({c}) >= {_DBL_ABS_MAX!r} THEN 'OOR' "
                f"ELSE CAST(CAST(floor({c} * 10000.0) AS BIGINT) AS VARCHAR) "
                f"END, 'NULL')"
            )
        return f"coalesce(CAST({c} AS VARCHAR), 'NULL')"

    ordered = [cols[i] for i in _col_order(cols)]
    cells = ", ".join(cell(c) for c in ordered)
    # symmetric single-pass range check to spark_agg_hash's, so an
    # out-of-range double fails with the same actionable message on
    # either side — validated before any hash is compared
    finite_max = "".join(
        f", max(CASE WHEN isnan({c}) OR isinf({c}) THEN NULL "
        f"ELSE abs({c}) END) AS \"__mx_{c}\""
        for c in dbl
    )
    row = con.sql(
        f"SELECT count(*) AS n, "
        f"sum(('0x' || substr(md5(concat_ws('|', {cells})), 1, 15))::BIGINT)"
        f"::HUGEINT AS h{finite_max} FROM {from_clause}"
    ).fetchone()
    too_big = [c for i, c in enumerate(dbl)
               if row[2 + i] is not None and row[2 + i] >= _DBL_ABS_MAX]
    if too_big:
        raise ValueError(
            f"--agg double column(s) {too_big} hold finite values >= "
            f"{_DBL_ABS_MAX:.0e} — the 4dp fixed-point encoding would "
            "overflow the BIGINT cast; use the collect compare"
        )
    return int(row[0]), int(row[1] or 0)


# ---------------------------------------------------------------------------


# Keys whose sf1 output is too large (or too slow) to collect AND whose
# output columns are all agg-hash-safe per the docstring criteria —
# --all switches these to the commutative-hash compare automatically.
#   x_dedup_simhash: 164M implied pairs at sf1, int/string columns only.
#   q_unpivot: 24M rows at sf1 — 181 s of collect-compare HARNESS cost
#     in the r11 gate vs 0.31 s of query (SCALE.md §7r, VERDICT r11 #6);
#     its one double column `val` is a pure projection of lineitem data,
#     so both engines feed bit-identical doubles to the 4dp encoding.
AGG_KEYS = frozenset({"x_dedup_simhash", "q_unpivot"})

# Under --all, collect-based keys are row-count-capped so a future
# large-output key fails with an actionable hint instead of an opaque
# driver-side OOM during fetchall (ADVICE r11).  With q_unpivot (24M
# rows) moved to AGG_KEYS, every remaining collect key is far below 10M
# at sf1 (the r12 full sweep ran clean under this ceiling).
ROW_CEILING = int(os.environ.get("ROW_CEILING", 10_000_000))


def _spark_alive(spark) -> bool:
    """True iff the session's JVM still answers a trivial 1-task job."""
    try:
        spark.range(0, 1, 1, 1).count()
        return True
    except Exception:  # noqa: BLE001 — any py4j/socket error means dead
        return False


def _revive_spark(old):
    """Replace a dead local-mode Spark JVM with a fresh one mid-run.

    The r12 full sweep lost 55 keys to ONE executor heap OOM: in local
    mode the dead JVM takes the py4j gateway with it, so every later
    key's spark phase failed with ConnectionRefusedError while the
    DuckDB side kept working.  A standing 226-key gate must contain
    that blast radius to the key that OOM'd (retried once on a fresh
    heap), not the rest of the run.  Clearing the client-side
    singletons is what makes getOrCreate launch a NEW JVM instead of
    handing back the corpse.

    VERSION PIN (ADVICE r12 #3): the attribute pokes below are private
    PySpark client internals, written against pyspark 4.1 — a PySpark
    upgrade can silently change singleton handling.  The canary is
    tests/test_sf1_tooling.py's subprocess revival test (kills a real
    JVM, revives, asserts a job answers); re-verify it on any PySpark
    bump before trusting this path.  The post-revival _spark_alive
    assert below also fails loud rather than handing back a corpse."""
    from pyspark import SparkContext
    from pyspark.sql import SparkSession

    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.session import get_spark

    try:
        old.stop()
    except Exception:  # noqa: BLE001 — stopping a dead JVM throws; fine
        pass
    SparkContext._active_spark_context = None
    SparkContext._gateway = None
    SparkContext._jvm = None
    SparkSession._instantiatedSession = None
    SparkSession._activeSession = None
    spark = get_spark("verify-sf1-staged")
    spark.sparkContext.setLogLevel("ERROR")
    if not _spark_alive(spark):
        raise RuntimeError(
            "JVM revival produced a session that does not answer a "
            "1-task job — private-API singleton clearing no longer "
            "works on this PySpark version; see docstring version pin"
        )
    return spark


def main() -> int:
    import duckdb

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    bad_flags = flags - {"--agg", "--all"}
    if bad_flags:
        print(f"unknown flag(s): {', '.join(sorted(bad_flags))}")
        return 2
    agg_mode = "--agg" in flags
    all_mode = "--all" in flags
    if agg_mode and all_mode:
        # --all already auto-selects the hash compare for AGG_KEYS;
        # forcing it globally would TypeError every double-output key
        # and report a misleading mass of failures
        print("--agg cannot combine with --all (AGG_KEYS auto-selects)")
        return 2

    import __spark_entry__ as entrymod
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.session import get_spark

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if all_mode:
        keys = args or list(qs)
    else:
        keys = args or ["x_curate_corpus", "q_triangle_count"]
    unknown = [k for k in keys if k not in qs or k not in oracles]
    if unknown:
        print(f"unknown/oracle-less key(s): {', '.join(unknown)}")
        return 2

    workdir = tempfile.mkdtemp(prefix="sf1_staged_", dir="/tmp")
    con = duckdb.connect()
    con.sql(f"SET memory_limit='{MEM}'")
    con.sql(f"SET temp_directory='{workdir}/duck_tmp'")
    for t in BASE_TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")

    spark = get_spark("verify-sf1-staged")
    spark.sparkContext.setLogLevel("ERROR")

    failures, passed = [], 0
    try:
        for pos, key in enumerate(keys, 1):
            use_agg = agg_mode or (all_mode and key in AGG_KEYS)
            tag = " [agg]" if use_agg else ""
            print(f"[{key}] ({pos}/{len(keys)}) staged oracle replay "
                  f"@ {SF_DIR}{tag}", flush=True)
            t0 = time.time()
            key_views: list[str] = []
            # per-key staging dir, removed as soon as the DuckDB phase is
            # done: under --all the staged parquet of 226 keys would
            # otherwise accumulate in one dir and exhaust the host disk
            # at sf1 (the whole point of staging was bounding disk)
            key_dir = os.path.join(workdir, key)
            os.makedirs(key_dir, exist_ok=True)
            try:
                rel = staged_oracle(
                    con, oracles[key], key_dir, key, created_views=key_views
                )
                duck_cols = list(rel.columns)
                if use_agg:
                    view = f"__final_{key}"
                    con.sql(f"CREATE OR REPLACE VIEW {view} AS {rel.sql_query()}")
                    key_views.append(view)
                    dn, dh = duck_agg_hash(con, view, duck_cols)
                    duck_rows = None
                else:
                    if all_mode:
                        # ADVICE r11: cap the collect path under --all so
                        # a future large-output key fails with a hint, not
                        # a driver OOM mid-gate.  ADVICE r12 #2: probe via
                        # fetchmany(ceiling+1) on the relation's streaming
                        # cursor instead of a count(*) pre-query — the old
                        # form re-executed the ENTIRE final SELECT once per
                        # key, doubling DuckDB compute for compute-heavy
                        # finals; fetchmany executes once, the remainder
                        # never materializes past the ceiling, and an
                        # under-ceiling probe already IS the full result.
                        duck_rows = rel.fetchmany(ROW_CEILING + 1)
                        if len(duck_rows) > ROW_CEILING:
                            raise ValueError(
                                f"output too large for the collect compare "
                                f"under --all (> ROW_CEILING={ROW_CEILING} "
                                "rows); add the key to AGG_KEYS if "
                                "dtype-eligible (see --agg criteria) or "
                                "raise ROW_CEILING explicitly"
                            )
                    else:
                        duck_rows = rel.fetchall()
            except Exception as e:  # noqa: BLE001
                failures.append((key, f"DUCKDB: {type(e).__name__}: {str(e)[:300]}"))
                print(f"[FAIL] {key}: duckdb error", flush=True)
                continue
            finally:
                # one key's CTE views must not leak into the next key's
                # namespace (same shared connection); rows/hashes are
                # already fetched, so the backing parquet can go too
                for v in reversed(key_views):
                    con.sql(f"DROP VIEW IF EXISTS {v}")
                shutil.rmtree(key_dir, ignore_errors=True)
            t_duck = time.time() - t0
            t0 = time.time()
            spark_err = None
            for _attempt in (1, 2):
                try:
                    sdf = qs[key](spark, SF_DIR)
                    spark_cols = list(sdf.columns)
                    if use_agg:
                        sn, sh = spark_agg_hash(sdf)
                    else:
                        spark_rows = [tuple(r) for r in sdf.collect()]
                    spark_err = None
                    break
                except Exception as e:  # noqa: BLE001
                    spark_err = f"SPARK: {type(e).__name__}: {str(e)[:300]}"
                    if _spark_alive(spark):
                        break  # genuine query error: no blind retry
                    # JVM died (heap OOM kills the whole local-mode JVM):
                    # revive so the blast radius is THIS key, retried
                    # once on a fresh heap — not the rest of the run
                    print(f"[warn] {key}: Spark JVM died — reviving "
                          "session", flush=True)
                    spark = _revive_spark(spark)
            if spark_err:
                failures.append((key, spark_err))
                print(f"[FAIL] {key}: spark error", flush=True)
                continue
            t_spark = time.time() - t0
            problems = []
            if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
                problems.append(f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            if use_agg:
                if not problems and (sn, sh) != (dn, dh):
                    problems.append(f"agg spark=({sn},{sh}) duck=({dn},{dh})")
                n_out = f"{sn} rows (commutative-hash compare)"
            else:
                if len(spark_rows) != len(duck_rows):
                    problems.append(
                        f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
                if not problems:
                    hs = _hash_rows(spark_cols, spark_rows)
                    hd = _hash_rows(duck_cols, duck_rows)
                    if hs != hd:
                        problems.append(f"value-hash spark={hs} duck={hd}")
                        o_s, o_d = _col_order(spark_cols), _col_order(duck_cols)
                        ls = sorted("|".join(_norm_cell(r[i]) for i in o_s)
                                    for r in spark_rows)
                        ld = sorted("|".join(_norm_cell(r[i]) for i in o_d)
                                    for r in duck_rows)
                        for a, b in zip(ls, ld):
                            if a != b:
                                problems.append(
                                    f"  first diff:\n   spark: {a[:220]}"
                                    f"\n   duck : {b[:220]}")
                                break
                n_out = f"{len(spark_rows)} rows"
            if problems:
                failures.append((key, "; ".join(problems)))
                print(f"[FAIL] {key}: {problems[0]}", flush=True)
            else:
                passed += 1
                print(f"[ok] {key}: {n_out} "
                      f"(duck {t_duck:.0f}s, spark {t_spark:.0f}s)", flush=True)
    finally:
        spark.stop()
        con.close()
        shutil.rmtree(workdir, ignore_errors=True)

    print(f"\n{passed} matched, {len(failures)} failed / {len(keys)} keys")
    for k, msg in failures:
        print(f"--- {k}\n{msg}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
