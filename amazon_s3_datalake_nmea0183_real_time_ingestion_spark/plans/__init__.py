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

# The driver adjudicates queries() in dict-insertion order and caps at 50
# keys per round.  After round 7: 199/203 keys have a green driver row at
# their latest check, 0 failures ever.  Round 8 (VERDICT.md r7 "Next round"
# #1/#2) front-loads:
#   1. slots 1-4 = the ONLY 4 keys with no driver row ever (Tier K slots
#      51-54 of the r7 window; judge-verified locally in r7, and
#      x_cusum_changepoint's min-floor fix this round needs adjudication);
#   2. round-8 new keys (theta/KMV sketch intersection) — names listed
#      ahead of registration; _front_load skips unknown keys;
#   3. the 50 r4-era stale rows (3 rounds old; must cycle in r8/r9).
#      4 + new + 50 > 50, so the trailing few r4 keys slip past the cut
#      and lead the r9 queue — no first-ever row can be displaced.
_NEEDS_VERDICT = [
    # never-adjudicated (r7 VERDICT #1) — MUST hold slots 1-4
    "x_calibration", "x_cusum_changepoint", "x_forecast_mase",
    "x_gini_concentration",
    # round-8 new keys — first driver row needed
    "x_theta_intersect", "x_dp_counts",
    "x_benford", "x_autocorr", "x_l_diversity", "x_basket_rules",
    "x_seasonality_strength", "x_rfm", "x_cohort_ltv", "x_target_encoding",
    "x_active_users", "x_sprt", "x_geo_grid", "x_ks_test", "x_conformal",
    # r4-era stale rows (r7 VERDICT #2), CORRECTNESS_r04 insertion order
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
