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

# The driver adjudicates queries() in dict-insertion order and caps at 50
# keys per round.  After round 5: 150/160 keys driver-green at their latest
# check, 0 failures ever; the 10 Tier G batch-2/3 keys (registered late in
# r5) have NO driver row yet, and the 50 r3-era keys' latest rows are r3.
# Round 6 (per VERDICT.md r5 "Next round" #1) front-loads:
#   1. the 10 Tier G keys with no driver row ever;
#   2. round-6 new keys (curate_corpus pipeline, guarded graph twins,
#      2-level IVF) — first driver row;
#   3. the oldest r3-era rows (CORRECTNESS_r03 insertion order) fill the
#      remaining slots (32 with the 8 Tier H keys registered).
# The 100 keys adjudicated in r4/r5 are green on current data and pay no
# window rent.
_NEEDS_VERDICT = [
    # Tier G batch-2/3 (registered r5, zero driver rows) — first in line
    "x_rank_fusion", "x_percentile_norm", "x_dedup_census",
    "x_split_leakage", "x_split_cluster_safe", "x_keywords_tfidf",
    "x_lang_mismatch", "x_embed_norms", "x_dataset_diff", "x_source_kl",
    # Round-6 new keys — first driver row needed (names listed ahead of
    # registration; _front_load skips any not yet in REGISTRY)
    "x_curate_corpus",
    "q_triangle_count_guarded", "x_pagerank_guarded", "x_lpa_guarded",
    "x_sim_ivf_2level", "x_dedup_cluster_star", "x_sim_ivf_2level_exact",
    "x_curriculum_shards",
    # Oldest rows (latest = r3; CORRECTNESS_r03 insertion order) fill the
    # remaining 32 slots
    "x_dataset_card", "x_decontaminate_near", "x_chunk_documents",
    "x_multimodal_decode", "x_dedup_ledger_near", "q_funnel", "q_retention",
    "q_gapfill", "x_scd2", "x_bm25", "x_surprisal", "x_dedup_best",
    "x_zorder", "x_pagerank", "q_merge", "q_pattern_match",
    "q_agg_approx_quantile", "x_ann_recall", "q_fn_variant", "x_data_checks",
    "x_dedup_url", "q_histogram", "q_join_asof_near",
    "q_scan_prune", "q_project_filter", "q_join_inner", "q_join_left",
    "q_join_semi", "q_join_anti", "q_join_range", "q_join_asof",
    "q_agg_basic",
    # --- 50-slot window closes here for round 6 (18 priority + 32 r3) ---
    "q_agg_distinct", "q_agg_approx", "q_agg_rollup",
    "q_agg_cube", "q_win_rank", "q_win_lag", "q_win_rolling",
    "q_topk", "q_union", "q_intersect", "q_except",
    "q_fn_string", "q_fn_datetime", "q_fn_math", "q_fn_haversine",
    "q_fn_array", "q_fn_json", "q_subquery",
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
