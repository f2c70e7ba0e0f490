"""Tier L semantics on hand-built tables: Benford digit extraction +
chi-square arithmetic, ACF of a planted period-2 series, l-diversity
flags on a single-band vs multi-band class, a-priori pruning +
confidence/lift on hand-built baskets, and seasonal strength = 1.0 on
a pure weekly cycle.

Each test writes a tiny synthetic parquet table into tmp_path and runs
the REGISTERED plan against it — the exact code path the driver
adjudicates, not a re-implementation."""

from __future__ import annotations

import math
from datetime import datetime

from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.plans import REGISTRY


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


# ---------------------------------------------------------------------------
# x_benford
# ---------------------------------------------------------------------------


def test_benford_digits_and_chi(spark, tmp_path):
    # 9 orders with first digits 1,1,1,2,2,3,9 and one sub-1.0 row that
    # the >= 1.0 screen must drop (Benford is undefined below the first
    # significand decade in this integer-part extraction).
    prices = [123.4, 1999.0, 1.07, 25.5, 234567.8, 3.14, 900.0, 0.42]
    rows = [
        (i, i, "O", p, datetime(2024, 1, 1), "1-URGENT")
        for i, p in enumerate(prices)
    ]
    _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = {
        r.digit: r
        for r in REGISTRY["x_benford"].fn(spark, str(tmp_path)).collect()
    }
    # the 9-digit spine emits every digit; absent ones carry n = 0
    assert set(out) == set(range(1, 10))
    assert {d: out[d].n for d in sorted(out)} == {
        1: 3, 2: 2, 3: 1, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0, 9: 1,
    }
    big_n = 7  # 0.42 dropped
    p1 = math.log10(2.0)
    assert out[1].expected_r == round(big_n * p1, 6)
    chi1 = (3 - big_n * p1) ** 2 / (big_n * p1)
    assert abs(out[1].chi_r - chi1) < 1e-6
    # an absent digit's contribution is exactly N·p (its expected count)
    p4 = math.log10(1.0 + 1.0 / 4)
    assert abs(out[4].chi_r - big_n * p4) < 1e-6
    # total is the same in every row and equals the sum of contributions
    totals = {r.chi_total_r for r in out.values()}
    assert len(totals) == 1
    assert abs(totals.pop() - round(sum(r.chi_r for r in out.values()), 4)) < 1e-9


# ---------------------------------------------------------------------------
# x_autocorr
# ---------------------------------------------------------------------------


def test_autocorr_period2_series(spark, tmp_path):
    # Daily counts alternate 1,3,1,3,... over 10 days: mean 2, so
    # deviations alternate -1,+1 and r_k = (10-k)/10 * (-1)^k exactly.
    rows = []
    eid = 0
    for day in range(1, 11):
        n = 1 if day % 2 == 1 else 3
        for _ in range(n):
            rows.append(
                (eid, datetime(2024, 1, day, 12, 0, 0), 1, "click", 1.0, "{}")
            )
            eid += 1
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        r.lag_k: r.acf_r
        for r in REGISTRY["x_autocorr"].fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == set(range(1, 8))
    for k in range(1, 8):
        expect = (10 - k) / 10 * (-1 if k % 2 == 1 else 1)
        assert abs(out[k] - expect) < 1e-6, (k, out[k], expect)


def test_autocorr_constant_series_is_null(spark, tmp_path):
    rows = [
        (d, datetime(2024, 1, d + 1), 1, "click", 1.0, "{}") for d in range(9)
    ]
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = REGISTRY["x_autocorr"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 7 and all(r.acf_r is None for r in out)


# ---------------------------------------------------------------------------
# x_l_diversity
# ---------------------------------------------------------------------------


def test_l_diversity_flags(spark, tmp_path):
    # class (0, A): 4 members all in band 0  -> l_distinct 1, meets_l 0
    # class (1, B): 3 members in bands 0,1,2 -> l_distinct 3, meets_l 1
    rows = [
        (1, "a", 0, 100.0, "A"),
        (2, "b", 0, 900.0, "A"),
        (3, "c", 0, 1500.0, "A"),
        (4, "d", 0, 10.0, "A"),
        (5, "e", 1, 100.0, "B"),
        (6, "f", 1, 2100.0, "B"),
        (7, "g", 1, 4100.0, "B"),
    ]
    _write(
        spark, tmp_path, "customer", rows,
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
    )
    out = {
        (r.nationkey, r.mktsegment): r
        for r in REGISTRY["x_l_diversity"].fn(spark, str(tmp_path)).collect()
    }
    assert out[(0, "A")].group_n == 4
    assert out[(0, "A")].l_distinct == 1 and out[(0, "A")].meets_l == 0
    assert out[(1, "B")].l_distinct == 3 and out[(1, "B")].meets_l == 1


# ---------------------------------------------------------------------------
# x_basket_rules
# ---------------------------------------------------------------------------


def test_basket_rules_apriori_and_lift(spark, tmp_path):
    # Parts A=1, B=2 co-occur in 20 orders (support 20 each, at the
    # min-support boundary); part C=3 appears in 5 orders together with
    # A — C is infrequent, so no (A, C) rule may survive the a-priori
    # prune even though pair_n would be 5.
    rows = []
    for o in range(20):
        rows.append((o, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
                     datetime(2024, 1, 1)))
        rows.append((o, 2, 1, 2, 1.0, 10.0, 0.0, 0.0, "N", "O",
                     datetime(2024, 1, 1)))
        if o < 5:
            rows.append((o, 3, 1, 3, 1.0, 10.0, 0.0, 0.0, "N", "O",
                         datetime(2024, 1, 1)))
    schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp"
    )
    _write(spark, tmp_path, "lineitem", rows, schema)
    out = REGISTRY["x_basket_rules"].fn(spark, str(tmp_path)).collect()
    assert [(r.part_a, r.part_b) for r in out] == [(1, 2)]
    r = out[0]
    assert r.pair_n == 20
    assert r.conf_ab_r == 1.0 and r.conf_ba_r == 1.0
    # lift = pair_n * N / (s_a * s_b) = 20 * 20 / 400 = 1.0
    assert r.lift_r == 1.0


def test_basket_rules_minpair_floor(spark, tmp_path):
    # Two frequent parts that co-occur only ONCE: below _BASKET_MINPAIR,
    # so no rule — the noise floor is enforced after the join.
    rows = []
    for o in range(20):
        rows.append((o, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
                     datetime(2024, 1, 1)))
    for o in range(19, 39):
        rows.append((o, 2, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
                     datetime(2024, 1, 1)))
    schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp"
    )
    _write(spark, tmp_path, "lineitem", rows, schema)
    assert REGISTRY["x_basket_rules"].fn(spark, str(tmp_path)).count() == 0


# ---------------------------------------------------------------------------
# x_seasonality_strength
# ---------------------------------------------------------------------------


def test_seasonality_pure_weekly_cycle(spark, tmp_path):
    # Counts follow an exact weekly pattern over 28 days: the 7-day MA is
    # the constant weekly mean, the dow means reproduce the detrended
    # series exactly, the remainder is 0 -> strength 1.0.
    pattern = [2, 5, 3, 7, 4, 6, 1]  # Mon..Sun counts (2024-01-01 is Mon)
    rows = []
    eid = 0
    for day in range(28):
        for _ in range(pattern[day % 7]):
            rows.append(
                (eid, datetime(2024, 1, day + 1, 8), 1, "click", 1.0, "{}")
            )
            eid += 1
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        r.dow: r
        for r in REGISTRY["x_seasonality_strength"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == set(range(7))
    mean = sum(pattern) / 7.0
    for dow in range(7):
        assert abs(out[dow].seas_r - (pattern[dow] - mean)) < 1e-6
        assert out[dow].strength_r == 1.0
    # 22 interior days (28 - 2*3) split across dows
    assert sum(r.n_days for r in out.values()) == 22


# ---------------------------------------------------------------------------
# x_rfm
# ---------------------------------------------------------------------------


def test_rfm_scores_and_recency(spark, tmp_path):
    # 5 customers, strictly ordered on every axis -> each lands in its
    # own quintile; customer 1 is best on all three (score 1,1,1).
    rows = []
    ok = 0
    for cust in range(1, 6):
        # customer c: last order (6-c) days before ref, c orders total,
        # 100*c revenue per order
        for i in range(cust):
            rows.append(
                (ok, cust, "O", 100.0 * cust,
                 datetime(2024, 1, 26 - (5 - cust) - (i * 3), 0), "1-URGENT")
            )
            ok += 1
    _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = {
        r.custkey: r for r in REGISTRY["x_rfm"].fn(spark, str(tmp_path)).collect()
    }
    assert len(out) == 5
    # ref day = newest order = customer 5's latest (2024-01-26)
    assert out[5].recency_days == 0 and out[1].recency_days == 4
    assert out[5].frequency == 5 and out[5].monetary_r == 2500.0
    # one customer per quintile on each axis
    assert [out[c].r_score for c in range(1, 6)] == [5, 4, 3, 2, 1]
    assert [out[c].f_score for c in range(1, 6)] == [5, 4, 3, 2, 1]
    assert [out[c].m_score for c in range(1, 6)] == [5, 4, 3, 2, 1]


# ---------------------------------------------------------------------------
# x_cohort_ltv
# ---------------------------------------------------------------------------


def test_cohort_ltv_triangle(spark, tmp_path):
    # cohort 2024-01 (ym 24289): custs 1,2; cohort 2024-02: cust 3.
    # cohort-1 revenue: age 0 -> 10.00 + 20.00, age 1 -> 5.50 (cust 2)
    rows = [
        (1, 1, "O", 10.00, datetime(2024, 1, 5), "x"),
        (2, 2, "O", 20.00, datetime(2024, 1, 20), "x"),
        (3, 2, "O", 5.50, datetime(2024, 2, 1), "x"),
        (4, 3, "O", 7.25, datetime(2024, 2, 10), "x"),
    ]
    _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = {
        (r.cohort_ym, r.age_months): r
        for r in REGISTRY["x_cohort_ltv"].fn(spark, str(tmp_path)).collect()
    }
    ym_jan = 2024 * 12 + 1
    a0 = out[(ym_jan, 0)]
    a1 = out[(ym_jan, 1)]
    assert a0.rev_r == 30.0 and a0.cum_rev_r == 30.0 and a0.cohort_n == 2
    assert a1.rev_r == 5.5 and a1.cum_rev_r == 35.5
    assert a1.ltv_per_cust_r == 17.75
    b0 = out[(ym_jan + 1, 0)]
    assert b0.rev_r == 7.25 and b0.cohort_n == 1 and b0.ltv_per_cust_r == 7.25


# ---------------------------------------------------------------------------
# x_target_encoding
# ---------------------------------------------------------------------------


def test_target_encoding_loo_and_singleton(spark, tmp_path):
    # source A: docs 1,2 en + doc 3 fr; source B: doc 4 en (singleton).
    rows = [
        (1, "t", "en", "A", 1),
        (2, "t", "en", "A", 1),
        (3, "t", "fr", "A", 1),
        (4, "t", "en", "B", 1),
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        r.doc_id: r
        for r in REGISTRY["x_target_encoding"].fn(spark, str(tmp_path)).collect()
    }
    prior = 3.0 / 4.0
    m = 10.0
    # doc 1 (A, y=1): LOO mean of {doc2=1, doc3=0} smoothed
    assert abs(out[1].enc_r - round((2 - 1 + m * prior) / (3 - 1 + m), 6)) < 1e-12
    # doc 3 (A, y=0): LOO mean of {1, 1} smoothed
    assert abs(out[3].enc_r - round((2 - 0 + m * prior) / (3 - 1 + m), 6)) < 1e-12
    # singleton source: denominator is 0 + m, encoding collapses to prior
    assert abs(out[4].enc_r - round((1 - 1 + m * prior) / (0 + m), 6)) < 1e-12
    assert out[4].enc_r == prior


# ---------------------------------------------------------------------------
# x_active_users
# ---------------------------------------------------------------------------


def test_active_users_rolling_horizons(spark, tmp_path):
    # user 1 active days 1..10; user 2 active day 1 only; user 3 day 8.
    rows = []
    eid = 0
    for day in range(1, 11):
        rows.append((eid, datetime(2024, 1, day), 1, "click", 1.0, "{}"))
        eid += 1
    rows.append((eid, datetime(2024, 1, 1), 2, "click", 1.0, "{}")); eid += 1
    rows.append((eid, datetime(2024, 1, 8), 3, "click", 1.0, "{}")); eid += 1
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        str(r.day): r
        for r in REGISTRY["x_active_users"].fn(spark, str(tmp_path)).collect()
    }
    assert len(out) == 10
    assert out["2024-01-01"].dau == 2  # users 1, 2
    assert out["2024-01-01"].wau == 2 and out["2024-01-01"].mau == 2
    # day 7: trailing week = days 1..7 -> users 1, 2
    assert out["2024-01-07"].dau == 1 and out["2024-01-07"].wau == 2
    # day 8: trailing week = days 2..8 -> users 1, 3 (user 2 aged out)
    assert out["2024-01-08"].wau == 2
    # MAU covers everything within 30 days
    assert out["2024-01-10"].mau == 3
    assert abs(out["2024-01-10"].stickiness_r - round(1 / 3, 6)) < 1e-12

    # the sketch-store twin on the same fixture: exact columns must equal
    # the exact key's counts, and at these cardinalities the HLL sits in
    # its sparse (exact) regime so every verdict flag is 1 — a broken
    # sketch build, union, or trailing frame flips one
    hll = {
        str(r.day): r
        for r in REGISTRY["x_active_users_hll"].fn(spark, str(tmp_path)).collect()
    }
    assert set(hll) == set(out)
    for day, r in hll.items():
        assert (r.dau_exact, r.wau_exact, r.mau_exact) == (
            out[day].dau, out[day].wau, out[day].mau
        ), day
        assert (r.dau_ok, r.wau_ok, r.mau_ok) == (1, 1, 1), day


# ---------------------------------------------------------------------------
# x_sprt
# ---------------------------------------------------------------------------


def test_sprt_boundaries_and_llr(spark, tmp_path):
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.plans.tierl import (
        _SPRT_P0, _SPRT_P1,
    )

    # day 1: 10 events, 0 purchases (evidence for H0);
    # day 2: 10 events, all purchases (strong evidence for H1).
    rows = []
    eid = 0
    for _ in range(10):
        rows.append((eid, datetime(2024, 1, 1), 1, "click", 1.0, "{}")); eid += 1
    for _ in range(10):
        rows.append((eid, datetime(2024, 1, 2), 1, "purchase", 1.0, "{}")); eid += 1
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        str(r.day): r
        for r in REGISTRY["x_sprt"].fn(spark, str(tmp_path)).collect()
    }
    c1 = math.log(_SPRT_P1 / _SPRT_P0)
    c2 = math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0))
    d1, d2 = out["2024-01-01"], out["2024-01-02"]
    assert (d1.cum_n, d1.cum_k) == (10, 0)
    assert abs(d1.llr_r - round(10 * c2, 6)) < 1e-12
    assert (d2.cum_n, d2.cum_k) == (20, 10)
    assert abs(d2.llr_r - round(10 * c1 + 10 * c2, 6)) < 1e-9
    # 10*c1 + 10*c2 = 10*ln(22/18) + 10*ln(78/82) ~ 1.50 -> still inside
    # the (+-2.944) Wald boundaries
    assert d1.decision == "continue" and d2.decision == "continue"


def test_sprt_rejects_h0_on_sustained_high_rate(spark, tmp_path):
    # 30 days x 20 events all purchases: LLR = n*ln(p1/p0) grows ~0.2/event,
    # crossing the upper boundary (2.944) within the first two days.
    rows = []
    eid = 0
    for day in range(1, 31):
        for _ in range(20):
            rows.append(
                (eid, datetime(2024, 1, day), 1, "purchase", 1.0, "{}")
            )
            eid += 1
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = sorted(
        REGISTRY["x_sprt"].fn(spark, str(tmp_path)).collect(),
        key=lambda r: r.day,
    )
    assert out[0].decision == "reject_h0"  # 20*ln(22/18) ~ 4.0 > 2.944
    assert all(r.decision == "reject_h0" for r in out)


# ---------------------------------------------------------------------------
# x_geo_grid
# ---------------------------------------------------------------------------


def test_geo_grid_cells_and_dominant_type(spark, tmp_path):
    # event_id 0: lat 0.5 - 90 = -89.5, lon 0.5 - 180 = -179.5 -> cell (0,0)
    # event_id 90: lat 0.5, lon (630%360)-180+0.5 = 90.5 -> cell (9, 27)
    rows = [
        (0, datetime(2024, 1, 1), 1, "click", 1.0, "{}"),
        (360, datetime(2024, 1, 1), 2, "view", 1.0, "{}"),   # same cell as 0
        (360, datetime(2024, 1, 1), 2, "view", 1.0, "{}"),   # dup event_id ok
        (90, datetime(2024, 1, 2), 3, "purchase", 1.0, "{}"),
    ]
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        (r.cell_lat, r.cell_lon): r
        for r in REGISTRY["x_geo_grid"].fn(spark, str(tmp_path)).collect()
    }
    # event_id 0 and 360: lat=-89.5 lon=-179.5 -> cell (0, 0)
    c00 = out[(0, 0)]
    assert c00.n == 3 and c00.n_users == 2
    assert c00.top_type == "view"  # 2 views beat 1 click
    assert c00.density_rank == 1
    c9 = out[(9, 27)]
    assert c9.n == 1 and c9.top_type == "purchase" and c9.density_rank == 2


def test_cohort_ltv_halfway_tie_rounds_half_up(spark, tmp_path):
    # r8 review regression: 32 customers, odd total cents -> the exact
    # LTV quotient 1121/3200 = 0.35031250 terminates at exactly 7
    # decimals ending in 5 (the class where float round() diverges
    # between engines); the BIGINT half-up DIV must give 0.350313.
    rows = [
        (c, c, "O", 0.36 if c == 0 else 0.35, datetime(2024, 1, 5), "x")
        for c in range(32)
    ]
    _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = REGISTRY["x_cohort_ltv"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].cohort_n == 32 and out[0].cum_rev_r == 11.21
    assert out[0].ltv_per_cust_r == 0.350313


def test_sprt_decision_is_sticky_after_crossing(spark, tmp_path):
    # day 1: 20/20 purchases -> LLR = 20*ln(22/18) ~ 4.01 crosses +2.944
    # (reject_h0).  days 2-40: zero purchases drag the cumulative LLR
    # deep negative -- the instantaneous position would read 'continue'
    # then 'accept_h0', but the SPRT STOPPED on day 1: every later row
    # must still report reject_h0.
    rows = []
    eid = 0
    for _ in range(20):
        rows.append((eid, datetime(2024, 1, 1), 1, "purchase", 1.0, "{}"))
        eid += 1
    for day in range(2, 31):
        for _ in range(20):
            rows.append((eid, datetime(2024, 1, day), 1, "click", 1.0, "{}"))
            eid += 1
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = sorted(
        REGISTRY["x_sprt"].fn(spark, str(tmp_path)).collect(),
        key=lambda r: r.day,
    )
    assert out[0].decision == "reject_h0"
    assert out[-1].llr_r < -2.944  # position DID cross the lower boundary
    assert all(r.decision == "reject_h0" for r in out)


# ---------------------------------------------------------------------------
# x_ks_test
# ---------------------------------------------------------------------------


def test_ks_disjoint_distributions_reject(spark, tmp_path):
    # clicks all at value 1.0, views all at 2.0: F1 jumps to 1 while
    # F2 is still 0 -> D = 1.0 at value 1.0, far past the critical value.
    rows = []
    eid = 0
    for _ in range(50):
        rows.append((eid, datetime(2024, 1, 1), 1, "click", 1.0, "{}")); eid += 1
    for _ in range(40):
        rows.append((eid, datetime(2024, 1, 1), 1, "view", 2.0, "{}")); eid += 1
    # an unrelated type must be excluded entirely
    rows.append((eid, datetime(2024, 1, 1), 1, "purchase", 9.0, "{}"))
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = REGISTRY["x_ks_test"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n1, r.n2) == (50, 40)
    assert r.ks_d_r == 1.0 and r.reject == 1
    assert r.at_value == 1.0
    crit = 1.3581015157406195 * math.sqrt((50 + 40) / (50 * 40.0))
    assert abs(r.crit_r - round(crit, 6)) < 1e-12


def test_ks_identical_distributions_accept(spark, tmp_path):
    # same empirical distribution for both types -> D = 0, no rejection
    rows = []
    eid = 0
    for v in [1.0, 2.0, 3.0, 4.0]:
        for t in ["click", "view"]:
            for _ in range(10):
                rows.append((eid, datetime(2024, 1, 1), 1, t, v, "{}"))
                eid += 1
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = REGISTRY["x_ks_test"].fn(spark, str(tmp_path)).collect()[0]
    assert r.ks_d_r == 0.0 and r.reject == 0
    assert r.at_value == 1.0  # all values tie at d_num = 0; min wins


# ---------------------------------------------------------------------------
# x_conformal
# ---------------------------------------------------------------------------


def test_conformal_coverage_guarantee_on_iid_data(spark, tmp_path):
    # 200 identically-shaped docs (iid by construction): empirical eval
    # coverage must be >= ~90% (the conformal guarantee) and q-hat one of
    # the observed score values.  Alternate en/fr so both label branches
    # of the nonconformity are exercised; vary stopword density so the
    # scores spread.
    rows = []
    for i in range(200):
        body = ("the and of " * (i % 7 + 1)) + ("xyz " * (7 - i % 7))
        rows.append((i, body, "en" if i % 2 == 0 else "fr", "s", len(body)))
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = REGISTRY["x_conformal"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_cal + r.n_eval == 200 and r.n_cal > 20
    assert 0.0 <= r.qhat_r <= 1.0
    # marginal guarantee: coverage >= 1 - alpha - small-sample slack
    assert r.coverage_r >= 0.85
    assert r.n_covered <= r.n_eval


def test_conformal_tiny_calibration_degenerates_to_full_coverage(
    spark, tmp_path
):
    # with ~2 docs the calibration half can be smaller than the rank
    # k = ceil((n+1)*0.9): q-hat degenerates to 1.0 and every eval doc
    # is covered (the conformal convention for an undefined quantile).
    rows = [
        (1, "the and of", "en", "s", 10),
        (2, "xyz xyz", "fr", "s", 7),
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = REGISTRY["x_conformal"].fn(spark, str(tmp_path)).collect()
    for r in out:
        if r.n_cal == 0 or (9 * (r.n_cal + 1) + 9) // 10 > r.n_cal:
            assert r.qhat_r == 1.0
        assert r.n_covered <= r.n_eval
