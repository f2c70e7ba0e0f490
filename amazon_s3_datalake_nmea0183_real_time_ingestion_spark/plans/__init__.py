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

# The driver adjudicates queries() in dict-insertion order and caps at 50
# keys per round.  Rounds 1-4 union: 123/123 keys green at latest check, but
# the 12 Tier E keys registered in round 4 have NO driver row yet (they
# landed after the r4 window was sized), 1 key's latest row is r2
# (x_sim_ivf2) and 22 keys' latest rows are r1 — both predating the round-3
# testdata regeneration.  Round 5 (per VERDICT.md r4 "Next round" #1)
# front-loads:
#   1. the 12 Tier E keys — first driver row ever;
#   2. round-5 new keys (guarded SemDeDup twin etc.) — first driver row;
#   3. x_sim_ivf2 (last r2-era row);
#   4. the 22 r1-era keys (oldest rows on pre-regeneration data);
#   5. the oldest r3 rows fill whatever slots remain.
# The 50 keys adjudicated in r4 are green on current data and pay no
# window rent.
_NEEDS_VERDICT = [
    # Tier E (registered r4, zero driver rows) — first in line
    "q_triangle_count", "x_outlier_mad", "q_ts_downsample",
    "x_sample_weighted", "x_decontaminate_bloom", "x_dedup_semantic",
    "x_dedup_lev", "x_sample_stratified", "x_winsorize",
    "x_dedup_containment", "x_drift_psi", "x_dedup_containment_guarded",
    # Round-5 new keys — first driver row needed
    "x_dedup_semantic_guarded",
    "x_novelty", "x_hard_negatives", "x_lpa", "x_dedup_substring",
    "x_data_temperature", "x_dsir", "x_dedup_substring_guarded",
    "x_label_noise",
    # Latest row = r2
    "x_sim_ivf2",
    # Latest row = r1 (22) — last rows on pre-regeneration testdata
    "agg_class_count", "f_from_json", "f_isbase64", "f_unbase64",
    "op_classify", "q_agg_grouping_sets", "q_agg_percentile", "q_agg_stats",
    "q_explode", "q_fn_bitwise", "q_fn_conditional", "q_fn_sql_udfs",
    "q_join_full", "q_lateral", "q_pivot", "q_recursive_cte",
    "q_trajectory", "q_unpivot", "q_win_firstlast", "q_win_ntile",
    "q_win_range", "src_ingest",
    # Round-5 second wave (Tier G) — first driver row needed; exactly 6
    # keys so the 50-slot window closes right here (no r1-era key is
    # displaced; oldest-r3 re-greens below wait for round 6).
    "x_embed_quantize", "x_sim_quantized", "x_token_entropy",
    "x_pmi_collocations", "x_lm_bigram", "x_minhash_calibration",
    # --- 50-slot window closes here for round 5 ---
    # Round-5 batch-2 keys (positions 51-54): no driver row yet; they are
    # the FIRST keys the round-6 rotation must front-load, ahead of any
    # re-green (same no-row-ever > stale-row priority VERDICT r4 set).
    "x_rank_fusion", "x_percentile_norm", "x_dedup_census",
    "x_split_leakage",
    "x_split_cluster_safe", "x_keywords_tfidf", "x_lang_mismatch",
    "x_embed_norms", "x_dataset_diff", "x_source_kl",
    # Oldest r3 rows (CORRECTNESS_r03 insertion order) fill the remainder
    "q_scan_prune", "q_project_filter", "q_join_inner", "q_join_left",
    "q_join_semi", "q_join_anti", "q_join_range", "q_join_asof",
    "q_agg_basic", "q_agg_distinct", "q_agg_approx", "q_agg_rollup",
    "q_agg_cube", "q_win_rank", "q_win_lag", "q_win_rolling",
]


# Redundant probe-knob variants that should never displace a distinct
# operator: none currently — x_sim_ivf2 is ordered explicitly above (51st,
# behind every distinct-operator re-green but ahead of the r1 batch).
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
