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

# The driver adjudicates queries() in dict-insertion order and caps at 50
# keys per round.  After round 6: all 168 keys green at their latest check,
# 0 failures ever.  Round 7 (per VERDICT.md r6 "Next round" #2) front-loads:
#   1. the 18 r3-era keys whose latest driver row is three rounds stale
#      (tierb.py:293-711) — the r6 window cut just before them;
#   2. round-7 new / re-registered keys (PQ, heavy hitters, BPE,
#      semantic-dedup rewired through the 2-level BLAS kernel) — names
#      listed ahead of registration; _front_load skips unknown keys;
#   3. oldest-r4 rows (CORRECTNESS_r04 insertion order) fill the rest.
# Keys adjudicated in r5/r6 are green on current data and pay no window rent.
_NEEDS_VERDICT = [
    # r3-era stale rows (VERDICT r6 "What's wrong #2") — first in line
    "q_agg_distinct", "q_agg_approx", "q_agg_rollup",
    "q_agg_cube", "q_win_rank", "q_win_lag", "q_win_rolling",
    "q_topk", "q_union", "q_intersect", "q_except",
    "q_fn_string", "q_fn_datetime", "q_fn_math", "q_fn_haversine",
    "q_fn_array", "q_fn_json", "q_subquery",
    # Round-7 new / re-registered keys — first driver row needed
    "x_dedup_semantic_guarded", "x_embed_pq", "x_sim_pq",
    "x_heavy_hitters", "x_vocab_bpe", "x_sim_zero_norm",
    "x_bpe_tokenize", "x_sim_ivfpq", "x_linreg_gd",
    "x_kcore", "x_jaccard_prefix", "x_hll_union", "x_shuffle_epoch",
    "x_block_sorted", "x_feature_mi", "x_scorer_spearman", "x_join_card",
    "x_f2_countsketch",
    # Tier K (round-7 third wave) — first driver row needed
    "x_ewma_anomaly", "x_agg_salted", "x_hll_intersect", "x_link_adamic",
    "x_ttest_welch", "x_srm_chisq", "x_bootstrap_ci",
    "x_seq_transitions", "x_cuped", "x_mmr_diversify", "x_skyline",
    "x_geo_nearest", "x_abtest_mde", "x_k_anonymity", "x_calibration",
    "x_cusum_changepoint", "x_forecast_mase", "x_gini_concentration",
    # Oldest-r4 rows (CORRECTNESS_r04 insertion order) fill the remaining
    # slots — first-ever rows above outrank r4 re-greens, so the trailing
    # r4 keys drop just past the 50-slot cut and lead the r8 queue
    # --- 50-slot window would close at 51 with x_calibration; the driver
    # caps at 50; r8 re-front-loads any key that missed its first row.
    # 18 r3 + 36 r7 = 54 listed, 50 adjudicated.
    # next-stale (remaining r4 rows, same order) queue behind the window
    "x_dedup_best_guarded", "x_dedup_cluster_guarded",
    "cat_recover", "cat_register", "f_contains", "f_element_at", "f_split",
    "op_alert_filter", "op_error_route", "op_event_partition",
    "op_flatten_soh", "op_geocode_join", "op_nmea_latlon", "q_agg_modern",
    "snk_raw_json", "snk_stage_parquet", "x_data_mix", "x_data_upsample",
    "x_decontaminate", "x_dedup_cluster", "x_dedup_embed", "x_dedup_exact",
    "x_dedup_near", "x_dedup_ngram", "x_dedup_simhash", "x_domain_quota",
    "x_embed_reduce", "x_kmeans_assign", "x_kmeans_iter", "x_multimodal",
    "x_multimodal_binary", "x_pack_sequences", "x_quality_model",
    "x_session", "x_sim_ivf", "x_sim_lsh", "x_sim_topk", "x_split_hash",
    "x_text_curate", "x_text_fingerprint", "x_text_langid",
    "x_text_line_dedup", "x_text_pii", "x_text_quality",
    "x_text_repetition", "x_text_tf", "x_text_tfidf", "x_text_tokens",
    "x_url_parse", "x_vocab_topk",
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
