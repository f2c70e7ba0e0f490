"""Tier M semantics on hand-built tables: Mann–Whitney exact half-unit
ranks (tie-averaged) and the separation/significance verdict, a planted
difference-in-differences treatment effect, a hand-computed Kaplan–Meier
curve with churned and censored customers, and Cramér's V on a
perfectly-associated contingency table (zero cells spine-joined in) —
plus hypothesis property tests pinning the MW U statistic to the
O(n²) pair-counting definition and the KM/NA curve to a sequential
pure-Python reference on random censored cohorts.

Each test writes a tiny synthetic parquet table into tmp_path and runs
the REGISTERED plan against it — the exact code path the driver
adjudicates, not a re-implementation."""

from __future__ import annotations

from datetime import datetime

from hypothesis import given, settings, strategies as st

from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.plans import REGISTRY


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(eid, day, uid, etype, value):
    return (eid, datetime(2024, 1, day), uid, etype, value, "{}")


# ---------------------------------------------------------------------------
# x_mann_whitney
# ---------------------------------------------------------------------------


def test_mann_whitney_tie_averaged_ranks(spark, tmp_path):
    """a = [1, 2, 2], b = [2, 3]: the three tied 2s share average rank 3,
    so R_a = 1 + 3 + 3 = 7, U_a = 7 - 3*4/2 = 1 — exact half-unit rank
    arithmetic, and the tie correction sum(t^3 - t) = 24 feeds the
    variance.  z = (1 - 3)/sqrt(0.5*(6 - 24/20)) = -1.291: not
    significant."""
    rows = [
        _ev(0, 1, 1, "a", 1.0), _ev(1, 1, 1, "a", 2.0), _ev(2, 1, 1, "a", 2.0),
        _ev(3, 1, 2, "b", 2.0), _ev(4, 1, 2, "b", 3.0),
        # NULL metric: not a trial — and must be screened BEFORE the rank
        # window (Spark NULLS FIRST vs DuckDB NULLS LAST would otherwise
        # shift every cumulative count)
        _ev(5, 1, 2, "b", None),
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = REGISTRY["x_mann_whitney"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.type_a, r.type_b) == ("a", "b")
    assert (r.n_a, r.n_b) == (3, 2)  # the NULL row is excluded
    assert r.u_a == 1.0
    assert abs(r.z_r - (-1.291)) < 1e-9
    assert r.significant == 0


def test_mann_whitney_complete_separation_significant(spark, tmp_path):
    """a = 1..5 all below b = 6..10: U_a = 0 (total dominance),
    z = -12.5/sqrt(25*11/12) = -2.6112 — significant at |z| > 1.96."""
    rows = [_ev(i, 1, 1, "a", float(i + 1)) for i in range(5)] + [
        _ev(5 + i, 1, 2, "b", float(i + 6)) for i in range(5)
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    r = REGISTRY["x_mann_whitney"].fn(spark, str(tmp_path)).collect()[0]
    assert r.u_a == 0.0
    assert abs(r.z_r - (-2.6112)) < 1e-9
    assert r.significant == 1


# ---------------------------------------------------------------------------
# x_diff_in_diff
# ---------------------------------------------------------------------------


def test_diff_in_diff_planted_effect(spark, tmp_path):
    """Users 1..4 (odd = treated), days 1..10 (split lands at day 5), base
    outcome 10 everywhere, +5 planted on treated-post cells, ±0.1 jitter
    balanced within every cell: DiD recovers exactly 5.0 and flags it;
    the pre-period difference (none here) is what the estimator would
    have subtracted."""
    rows = []
    eid = 0
    for uid in (1, 2, 3, 4):
        for day in range(1, 11):
            base = 10.0 + 0.1 * (day % 2)
            if uid % 2 == 1 and day >= 5:
                base += 5.0
            rows.append(_ev(eid, day, uid, "click", base))
            eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    r = REGISTRY["x_diff_in_diff"].fn(spark, str(tmp_path)).collect()[0]
    assert (r.n_treat_pre, r.n_treat_post) == (8, 12)
    assert (r.n_ctrl_pre, r.n_ctrl_post) == (8, 12)
    assert abs(r.mean_treat_post_r - 15.05) < 1e-9
    assert abs(r.mean_ctrl_post_r - 10.05) < 1e-9
    assert abs(r.did_r - 5.0) < 1e-9
    assert r.significant == 1


# ---------------------------------------------------------------------------
# x_survival
# ---------------------------------------------------------------------------


def test_survival_km_and_hazard_with_censoring(spark, tmp_path):
    """Four customers: A churns at bucket 0, B churns at bucket 2, C and D
    run to the observation end (censored at bucket 24).  Hand-computed:
    n_risk = [4, 3, 2], factors = [0.75, 0.666667, 1.0], KM = [0.75,
    0.5, 0.5], cumulative hazard = [0.25, 0.583333, 0.583333].  A naive
    churn rate would count C and D as churned — the censoring handling
    is the point."""
    rows = [
        (1, datetime(2020, 1, 1)),                               # A
        (2, datetime(2020, 1, 1)), (2, datetime(2020, 3, 1)),    # B (60 d)
        (3, datetime(2020, 1, 1)), (3, datetime(2021, 12, 31)),  # C
        (4, datetime(2020, 1, 1)), (4, datetime(2021, 12, 31)),  # D
    ]
    _write(
        spark, tmp_path, "orders", rows,
        "o_custkey long, o_orderdate timestamp",
    )
    out = {
        r.t_month: r
        for r in REGISTRY["x_survival"].fn(spark, str(tmp_path)).collect()
    }
    assert sorted(out) == [0, 2, 24]
    assert [out[t].n_risk for t in (0, 2, 24)] == [4, 3, 2]
    assert [out[t].d_churn for t in (0, 2, 24)] == [1, 1, 0]
    assert [out[t].c_censored for t in (0, 2, 24)] == [0, 0, 2]
    assert out[0].km_r == 0.75
    assert out[2].km_r == 0.5   # round(0.75 * round(2/3, 6), 6)
    assert out[24].km_r == 0.5  # censoring never drops the curve
    assert out[0].na_cumhaz_r == 0.25
    assert out[2].na_cumhaz_r == 0.583333
    assert out[24].na_cumhaz_r == 0.583333


# ---------------------------------------------------------------------------
# x_cramers_v
# ---------------------------------------------------------------------------


def test_cramers_v_perfect_association_with_spine(spark, tmp_path):
    """Priority fully determined by segment (2×2, 10 orders per diagonal
    cell): every cell's expected count is 5, each of the four cells
    (including the two ZERO cells the spine joins in) contributes
    (10-5)^2/5 = (0-5)^2/5 = 5, chi-square total = 20 = N, and with the
    DERIVED df = min(r−1, c−1) = 1 (r10, was a hardcoded 4 sized for the
    TPC-H 5×5 — the r9 ADVICE find), V = sqrt(20 / (20 * 1)) = 1.0:
    perfect association now actually reads as V = 1."""
    cust = [(1, "X"), (2, "Y")]
    _write(
        spark, tmp_path, "customer", cust,
        "c_custkey long, c_mktsegment string",
    )
    orders = [(i, 1, "P1") for i in range(10)] + [
        (10 + i, 2, "P2") for i in range(10)
    ]
    _write(
        spark, tmp_path, "orders", orders,
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    rows = REGISTRY["x_cramers_v"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 4  # spine: zero cells present
    by_cell = {(r.pri, r.seg): r for r in rows}
    assert by_cell[("P1", "X")].n == 10 and by_cell[("P1", "Y")].n == 0
    for r in rows:
        assert r.expected_r == 5.0
        assert r.chi_r == 5.0
        assert r.chi_total_r == 20.0
        assert r.cramers_v_r == 1.0


# ---------------------------------------------------------------------------
# x_auc / x_gains_lift
# ---------------------------------------------------------------------------

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs_separable():
    """10 English docs scoring 1.0 (all stopwords), 10 French docs
    scoring 0.0 (no stopwords) — a perfectly discriminating scorer."""
    rows = []
    for i in range(10):
        rows.append((i, "the of and to in", "en", "web", 16))
    for i in range(10):
        rows.append((10 + i, "zèbre quux flux jamais", "fr", "web", 22))
    return rows


def test_auc_perfect_separation_and_all_ties(spark, tmp_path):
    _write(spark, tmp_path, "documents", _docs_separable(), _DOC_SCHEMA)
    r = REGISTRY["x_auc"].fn(spark, str(tmp_path)).collect()[0]
    assert (r.n_pos, r.n_neg) == (10, 10)
    assert r.auc_r == 1.0 and r.gini_r == 1.0

    # identical text everywhere: every score ties, average ranks give
    # EXACTLY 0.5 — the tie handling is the assertion
    tied = [(i, "the quux", "en" if i < 10 else "fr", "web", 8)
            for i in range(20)]
    _write(spark, tmp_path, "documents", tied, _DOC_SCHEMA)
    r = REGISTRY["x_auc"].fn(spark, str(tmp_path)).collect()[0]
    assert r.auc_r == 0.5 and r.gini_r == 0.0


def test_gains_lift_deciles(spark, tmp_path):
    """20 docs, 2 per decile: the 10 positives fill deciles 1-5 exactly,
    so lift = 2.0 there (rate 1.0 vs base 0.5), cumulative gains reach
    1.0 at decile 5, and the tail deciles respond 0."""
    _write(spark, tmp_path, "documents", _docs_separable(), _DOC_SCHEMA)
    out = {r.decile: r
           for r in REGISTRY["x_gains_lift"].fn(spark, str(tmp_path)).collect()}
    assert sorted(out) == list(range(1, 11))
    for d in range(1, 6):
        assert out[d].n == 2 and out[d].n_pos == 2
        assert out[d].resp_rate_r == 1.0 and out[d].lift_r == 2.0
    for d in range(6, 11):
        assert out[d].n_pos == 0 and out[d].resp_rate_r == 0.0
        assert out[d].cum_gain_r == 1.0
    assert out[5].cum_gain_r == 1.0
    assert out[1].cum_gain_r == 0.2


# ---------------------------------------------------------------------------
# round-10 ADVICE regression probes: degenerate denominators + tie cube
# ---------------------------------------------------------------------------


def test_gains_lift_zero_positive_corpus_yields_null_not_throw(spark, tmp_path):
    """A corpus with ZERO positive labels (no 'en' documents): tot_pos = 0
    must yield NULL cum_gain_r / lift_r on the Spark side exactly like the
    oracle's nullif — not a Spark-only ANSI DIVIDE_BY_ZERO (r9 ADVICE)."""
    rows = [(i, "zèbre quux flux jamais", "fr", "web", 22) for i in range(20)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = REGISTRY["x_gains_lift"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 10
    for r in out:
        assert r.n_pos == 0
        assert r.resp_rate_r == 0.0
        assert r.cum_gain_r is None and r.lift_r is None


def test_cramers_v_single_priority_yields_null_not_throw(spark, tmp_path):
    """One distinct priority (1×2 table): df = min(r−1, c−1) = 0, so V is
    undefined — the derived-df expression must emit NULL on both engines,
    never divide by zero."""
    cust = [(1, "X"), (2, "Y")]
    _write(
        spark, tmp_path, "customer", cust,
        "c_custkey long, c_mktsegment string",
    )
    orders = [(i, 1 + i % 2, "P1") for i in range(10)]
    _write(
        spark, tmp_path, "orders", orders,
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    rows = REGISTRY["x_cramers_v"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 2  # 1 priority × 2 segments
    for r in rows:
        assert r.cramers_v_r is None


def test_mann_whitney_survives_multimillion_row_tie_group(spark, tmp_path):
    """One tie group of 2.2M rows: the BIGINT cube t³ would overflow int64
    ANSI-fatally at t ≥ 2^21 (r9 ADVICE); the DOUBLE-accumulated tie
    correction must complete with a finite z.  2.2e6³ ≈ 1.06e19 > 2^63."""
    big = spark.range(2_200_000).selectExpr(
        "id AS event_id", "timestamp'2024-01-01' AS ts", "id AS user_id",
        "'A' AS event_type", "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props",
    )
    small = spark.range(50).selectExpr(
        "id + 3000000 AS event_id", "timestamp'2024-01-02' AS ts",
        "id AS user_id", "'B' AS event_type",
        "CAST(2.0 AS DOUBLE) AS value", "'{}' AS props",
    )
    big.unionByName(small).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    r = REGISTRY["x_mann_whitney"].fn(spark, str(tmp_path)).collect()[0]
    assert (r.type_a, r.type_b) == ("A", "B")
    assert r.n_a == 2_200_000 and r.n_b == 50
    # every B value beats every A value: U_a = 0, a hugely significant z
    assert r.u_a == 0.0
    assert r.z_r is not None and r.significant == 1


# ---------------------------------------------------------------------------
# property tests: MW U == pair counting; KM/NA == sequential reference
# ---------------------------------------------------------------------------

_QUARTERS = st.integers(min_value=0, max_value=20).map(lambda i: i / 4.0)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(_QUARTERS, min_size=2, max_size=12),
    st.lists(_QUARTERS, min_size=2, max_size=12),
)
def test_mann_whitney_u_equals_pair_counting(spark, tmp_path_factory, va, vb):
    """The rank-sum U must equal its DEFINING quantity: the number of
    (a, b) pairs with a > b, counting ties half — on arbitrary small
    samples with heavy ties (quarter-grid values force tie groups)."""
    tmp_path = tmp_path_factory.mktemp("mwprop")
    rows = [_ev(i, 1, 1, "a", v) for i, v in enumerate(va)] + [
        _ev(100 + i, 1, 2, "b", v) for i, v in enumerate(vb)
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    r = REGISTRY["x_mann_whitney"].fn(spark, str(tmp_path)).collect()[0]
    u_ref = sum(
        1.0 if a > b else (0.5 if a == b else 0.0) for a in va for b in vb
    )
    assert (r.n_a, r.n_b) == (len(va), len(vb))
    assert r.u_a == u_ref  # exact halves on both sides


def _round6_half_up(x: float) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(x))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=300),   # first-order day
            st.integers(min_value=0, max_value=700),   # lifetime days
        ),
        min_size=1,
        max_size=12,
    )
)
def test_survival_matches_sequential_reference(spark, tmp_path_factory, spans):
    """KM and the NA hazard on a random censored cohort must equal a
    pure-Python sequential reference running the SAME pinned recurrence
    (round-half-up at 6 dp per step — the order-pinned fold contract)."""
    from datetime import timedelta

    tmp_path = tmp_path_factory.mktemp("kmprop")
    base = datetime(2020, 1, 1)
    rows = []
    for ck, (start, dur) in enumerate(spans):
        first = base + timedelta(days=start)
        rows.append((ck, first))
        if dur:
            rows.append((ck, first + timedelta(days=dur)))
    _write(spark, tmp_path, "orders", rows,
           "o_custkey long, o_orderdate timestamp")
    got = {
        r.t_month: r
        for r in REGISTRY["x_survival"].fn(spark, str(tmp_path)).collect()
    }

    # reference: bucket lifetimes, churn if last order > 365 d before end
    end = max(start + dur for start, dur in spans)
    buckets: dict[int, list[int]] = {}
    for start, dur in spans:
        t = dur // 30
        churned = 1 if (end - (start + dur)) > 365 else 0
        buckets.setdefault(t, []).append(churned)
    at_risk = 0
    km = 1.0
    na_u = 0
    expect = {}
    # suffix n_risk, then ascending-t sequential fold
    order = sorted(buckets)
    suffix = {}
    run = 0
    for t in reversed(order):
        run += len(buckets[t])
        suffix[t] = run
    for t in order:
        n_risk = suffix[t]
        d = sum(buckets[t])
        km = _round6_half_up(km * _round6_half_up((n_risk - d) / n_risk))
        na_u += round(_round6_half_up(d / n_risk) * 1e6)
        expect[t] = (n_risk, d, len(buckets[t]) - d, km,
                     _round6_half_up(na_u / 1e6))
    assert set(got) == set(expect)
    for t, (n_risk, d, c, km_e, na_e) in expect.items():
        r = got[t]
        assert (r.n_risk, r.d_churn, r.c_censored) == (n_risk, d, c), t
        assert r.km_r == km_e, t
        assert r.na_cumhaz_r == na_e, t


# ---------------------------------------------------------------------------
# x_dedup_simhash_rep (registered in tierc; round-9 scale fix)
# ---------------------------------------------------------------------------


def test_simhash_rep_collapses_identical_signatures(spark, tmp_path):
    """Three identical docs collapse to ONE representative with
    n_members = 3 and C(3,2) = 3 implied exact pairs; two near-dup docs
    (39 of 40 tokens shared) are separate reps that see each other as
    neighbors; an unrelated doc is isolated (NULL min_hamming).  The
    clique never materializes as pairs — that is the key's whole point
    (doc_ids >= 100 stay clear of the _doc_corpus plant)."""
    words = " ".join(f"w{i}" for i in range(40))
    words2 = " ".join(f"w{i}" for i in range(39)) + " zz"
    other = " ".join(f"q{i}x q{i}y q{i}z" for i in range(20))
    docs = [
        (100, words, "en", "web", len(words)),
        (101, words, "en", "web", len(words)),
        (102, words, "en", "web", len(words)),
        (110, words, "en", "web", len(words)),  # 4th identical member
        (111, words2, "en", "web", len(words2)),
        (120, other, "en", "web", len(other)),
    ]
    _write(spark, tmp_path, "documents", docs, _DOC_SCHEMA)
    out = {
        r.rep_id: r
        for r in REGISTRY["x_dedup_simhash_rep"].fn(spark, str(tmp_path)).collect()
    }
    # 3 distinct signatures -> 3 representatives
    assert set(out) == {100, 111, 120}
    a = out[100]
    assert a.n_members == 4 and a.exact_pairs == 6  # C(4,2)
    b = out[111]
    assert b.n_members == 1 and b.exact_pairs == 0
    # the near-dup pair is mutual, same closest distance on both sides
    assert a.n_near_nbrs >= 1 and b.n_near_nbrs >= 1
    assert a.min_hamming == b.min_hamming and 1 <= a.min_hamming <= 8
    c = out[120]
    assert c.n_near_nbrs == 0 and c.min_hamming is None
