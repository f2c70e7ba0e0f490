"""Query library — every SURVEY.md §2 engine op key, Spark impl + oracle SQL."""

from .registry import REGISTRY, Query, register  # noqa: F401

# Importing the modules populates REGISTRY.
from . import tierb  # noqa: F401,E402
from . import tiera  # noqa: F401,E402
from . import tierc  # noqa: F401,E402
from . import tierd  # noqa: F401,E402
from . import tiere  # noqa: F401,E402
from . import tierf  # noqa: F401,E402
from . import tierg  # noqa: F401,E402
from . import tierh  # noqa: F401,E402
from . import tieri  # noqa: F401,E402
from . import tierj  # noqa: F401,E402
from . import tierk  # noqa: F401,E402
from . import tierl  # noqa: F401,E402
from . import tierm  # noqa: F401,E402

# The driver adjudicates queries() in dict-insertion order and caps at 50
# keys per round.  After round 13: ALL 226 keys are green at their latest
# driver check, 0 failures ever; staleness census (union of
# CORRECTNESS_r01–r13, latest row per key): 26 keys at r9 (the oldest
# evidence anywhere), 50 each at r10/r11/r12/r13.  Round 14 (VERDICT.md
# r13 "Next round" #1–#2) front-loads:
#   1. slots 1-26 = the 26 r9-era rows, CORRECTNESS_r09 insertion order
#      — exactly the post-cut queue the r13 comment pinned;
#   2. slots 27-28 = x_pagerank + x_pagerank_guarded: the shipped
#      single-checkpoint remedy (weighted_edges one-pass fold; SCALE.md
#      §7t) changed both keys' plan this round, so by the
#      zero-changes-outside-window rule they enter the window now,
#      displacing the two newest r10-era candidates exactly as the r13
#      note prescribed;
#   3. slots 29-50 = the first 22 of the r10 block, CORRECTNESS_r10
#      insertion order.  The remaining r10-era keys are listed in the
#      same order past the cut (x_pagerank_guarded already holds a
#      window slot, so it is skipped there) so the r15 window continues
#      with no re-planning: r15 takes the 27 queued r10-era names below,
#      then starts the r11 block (CORRECTNESS_r11 insertion order,
#      skipping x_pagerank, which gets its fresh row this round).
_NEEDS_VERDICT = [
    # r9-era rows (r13 VERDICT #2) — MUST hold slots 1-26,
    # CORRECTNESS_r09 insertion order
    "x_theta_intersect", "x_active_users_hll", "x_diff_in_diff",
    "x_survival", "x_auc", "x_dedup_simhash_rep", "q_triangle_count",
    "x_outlier_mad", "q_ts_downsample", "x_sample_weighted",
    "x_decontaminate_bloom", "x_dedup_semantic", "x_dedup_lev",
    "x_sample_stratified", "x_winsorize", "x_dedup_containment",
    "x_drift_psi", "x_dedup_containment_guarded", "x_novelty",
    "x_hard_negatives", "x_lpa", "x_dedup_substring",
    "x_data_temperature", "x_dsir", "x_dedup_substring_guarded",
    "x_label_noise",
    # the r14 single-checkpoint remedy pair (code changed this round —
    # zero-changes-outside-window rule, r13 VERDICT #1/#3)
    "x_pagerank", "x_pagerank_guarded",
    # r10-era rows (next-oldest), CORRECTNESS_r10 insertion order; the
    # first 22 complete this round's window, the rest queue for r15
    "op_classify", "f_unbase64", "f_isbase64", "f_from_json",
    "agg_class_count", "src_ingest", "q_agg_grouping_sets",
    "q_agg_percentile", "q_agg_stats", "q_explode", "q_fn_bitwise",
    "q_fn_conditional", "q_fn_sql_udfs", "q_join_full", "q_lateral",
    "q_pivot", "q_recursive_cte", "q_trajectory", "q_unpivot",
    "q_win_firstlast", "q_win_ntile", "q_win_range",
    # --- r14 cut line (50) --- r15 continues here, r10 order preserved
    # (x_pagerank_guarded skipped: it holds slot 28 above)
    "x_embed_quantize", "x_lm_bigram", "x_minhash_calibration",
    "x_pmi_collocations", "x_sim_ivf2", "x_sim_quantized",
    "x_token_entropy", "cat_register", "x_sprt", "x_mmr_diversify",
    "x_gains_lift", "x_mann_whitney", "x_cramers_v", "x_dedup_simhash",
    "x_rank_fusion", "x_percentile_norm", "x_dedup_census",
    "x_split_leakage", "x_split_cluster_safe", "x_keywords_tfidf",
    "x_lang_mismatch", "x_embed_norms", "x_dataset_diff", "x_source_kl",
    "x_curate_corpus", "q_triangle_count_guarded", "x_lpa_guarded",
]


# Redundant probe-knob variants that should never displace a distinct
# operator: none currently.  (x_sim_ivf2 got its fresh driver row in r5
# and now sits in the unordered middle of the registry with the other
# current keys — no explicit ordering needed.)
_BACK: list[str] = []


def _front_load(priority: list[str], back: list[str]) -> None:
    # ADVICE r11: a typo'd rotation must fail at import, not silently
    # shrink the 50-key adjudication window.  The guards validate BOTH
    # lists (and their union — a key can't be front- and back-loaded)
    # and run before any mutation, so a failed rotation leaves REGISTRY
    # untouched; no silent `if k in REGISTRY` filtering remains.
    combined = priority + back
    unknown = [k for k in combined if k not in REGISTRY]
    if unknown:
        raise KeyError(f"_NEEDS_VERDICT/_BACK names not in REGISTRY: {unknown}")
    if len(set(combined)) != len(combined):
        dupes = sorted({k for k in combined if combined.count(k) > 1})
        raise ValueError(f"duplicate keys across _NEEDS_VERDICT/_BACK: {dupes}")
    ordered = {k: REGISTRY[k] for k in priority}
    ordered.update(
        {k: q for k, q in REGISTRY.items() if k not in ordered and k not in back}
    )
    ordered.update({k: REGISTRY[k] for k in back})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_front_load(_NEEDS_VERDICT, _BACK)
