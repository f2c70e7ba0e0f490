"""Query library — every SURVEY.md §2 engine op key, Spark impl + oracle SQL."""

from .registry import REGISTRY, Query, register  # noqa: F401

# Importing the modules populates REGISTRY.
from . import tierb  # noqa: F401,E402
from . import tiera  # noqa: F401,E402
from . import tierc  # noqa: F401,E402
from . import tierd  # noqa: F401,E402
from . import tiere  # noqa: F401,E402

# The driver adjudicates queries() in dict-insertion order and caps at 50
# keys per round.  Rounds 1-3 union: 121/121 keys green, but 71 keys' latest
# green row predates the round-3 testdata regeneration (events.ts ->
# TIMESTAMP_NTZ).  Round 4 (per VERDICT.md "Next round" #1/#3) front-loads:
#   1. brand-new round-4 keys (2 guarded dedup twins) — zero driver rows;
#   2. 48 of the 49 r2-row keys (every distinct OPERATOR first) — exactly
#      fills the 50-slot window;
#   3. x_sim_ivf2 (the 49th r2 key, a probe-knob variant of x_sim_ivf),
#      then the 22 r1-row keys — all past the window, round 5 takes them.
# The 50 keys adjudicated in r3 are already green on the new data and pay
# no window rent.
_NEEDS_VERDICT = [
    # Round-4 new keys — first driver row needed
    "x_dedup_best_guarded",
    "x_dedup_cluster_guarded",
    # Latest row = r2 (48 of 49; x_sim_ivf2 queues just below)
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
    # Round-4 Tier E keys (registered after the round-4 window was sized;
    # zero driver rows — round 5 front-loads these, then x_sim_ivf2, then
    # the r1 batch: 12 + 1 + 22 = 35 of 50 slots, the rest re-green r3 keys)
    "q_triangle_count", "x_outlier_mad", "q_ts_downsample",
    "x_sample_weighted", "x_decontaminate_bloom", "x_dedup_semantic",
    "x_dedup_lev", "x_sample_stratified", "x_winsorize",
    "x_dedup_containment", "x_drift_psi", "x_dedup_containment_guarded",
    # 49th r2 key — next in line after the Tier E batch
    "x_sim_ivf2",
    # Latest row = r1 (22) — round 5 takes these after x_sim_ivf2
    "agg_class_count", "f_from_json", "f_isbase64", "f_unbase64",
    "op_classify", "q_agg_grouping_sets", "q_agg_percentile", "q_agg_stats",
    "q_explode", "q_fn_bitwise", "q_fn_conditional", "q_fn_sql_udfs",
    "q_join_full", "q_lateral", "q_pivot", "q_recursive_cte",
    "q_trajectory", "q_unpivot", "q_win_firstlast", "q_win_ntile",
    "q_win_range", "src_ingest",
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
