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
# keys per round.  After round 10: ALL 226 keys are green at their latest
# driver check, 0 failures ever; staleness census (union of
# CORRECTNESS_r01–r10, latest row per key): 36 keys at r6, 49 at r7,
# 44 at r8, 47 at r9, 50 at r10.  Round 11 (VERDICT.md r10 "Next round"
# #1) front-loads:
#   1. slots 1-36 = the 36 r6-era rows (4 rounds stale — the oldest
#      evidence anywhere), CORRECTNESS_r06 insertion order, exactly the
#      post-cut queue the r10 comment pinned — nothing may displace them;
#   2. slots 37-50 = the 14 oldest r7-era rows, CORRECTNESS_r07
#      insertion order.  The remaining 35 r7-era keys are listed in the
#      same order past the cut so the r12 window continues with no
#      re-planning: r12 should take the next 35 r7-era names below,
#      then start the r8 block (CORRECTNESS_r08 insertion order).
_NEEDS_VERDICT = [
    # r6-era rows (r10 VERDICT #1) — MUST hold slots 1-36
    "x_sim_ivf_2level", "x_dedup_cluster_star", "x_sim_ivf_2level_exact",
    "x_curriculum_shards", "x_dataset_card", "x_decontaminate_near",
    "x_chunk_documents", "x_multimodal_decode", "x_dedup_ledger_near",
    "q_funnel", "q_retention", "q_gapfill", "x_scd2", "x_bm25",
    "x_surprisal", "x_dedup_best", "x_zorder", "x_pagerank", "q_merge",
    "q_pattern_match", "q_agg_approx_quantile", "x_ann_recall",
    "q_fn_variant", "x_data_checks", "x_dedup_url", "q_histogram",
    "q_join_asof_near", "q_scan_prune", "q_project_filter",
    "q_join_inner", "q_join_left", "q_join_semi", "q_join_anti",
    "q_join_range", "q_join_asof", "q_agg_basic",
    # r7-era rows (next-oldest), CORRECTNESS_r07 insertion order;
    # the first 14 complete this round's window, the rest queue for r12
    "q_agg_distinct", "q_agg_approx", "q_agg_rollup", "q_agg_cube",
    "q_win_rank", "q_win_lag", "q_win_rolling", "q_topk", "q_union",
    "q_intersect", "q_except", "q_fn_string", "q_fn_datetime",
    "q_fn_math",
    # --- r11 cut line (50) --- r12 continues here, r7 order preserved
    "q_fn_haversine", "q_fn_array", "q_fn_json", "q_subquery",
    "x_dedup_semantic_guarded", "x_embed_pq", "x_sim_pq",
    "x_heavy_hitters", "x_vocab_bpe", "x_sim_zero_norm", "x_bpe_tokenize",
    "x_sim_ivfpq", "x_linreg_gd", "x_kcore", "x_jaccard_prefix",
    "x_hll_union", "x_shuffle_epoch", "x_block_sorted", "x_feature_mi",
    "x_scorer_spearman", "x_join_card", "x_f2_countsketch",
    "x_ewma_anomaly", "x_agg_salted", "x_hll_intersect", "x_link_adamic",
    "x_ttest_welch", "x_srm_chisq", "x_bootstrap_ci", "x_seq_transitions",
    "x_cuped", "x_skyline", "x_geo_nearest", "x_abtest_mde",
    "x_k_anonymity",
]


# Redundant probe-knob variants that should never displace a distinct
# operator: none currently.  (x_sim_ivf2 got its fresh driver row in r5
# and now sits in the unordered middle of the registry with the other
# current keys — no explicit ordering needed.)
_BACK: list[str] = []


def _front_load(priority: list[str], back: list[str]) -> None:
    ordered = {k: REGISTRY[k] for k in priority if k in REGISTRY}
    ordered.update(
        {k: q for k, q in REGISTRY.items() if k not in ordered and k not in back}
    )
    ordered.update({k: REGISTRY[k] for k in back if k in REGISTRY})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_front_load(_NEEDS_VERDICT, _BACK)
