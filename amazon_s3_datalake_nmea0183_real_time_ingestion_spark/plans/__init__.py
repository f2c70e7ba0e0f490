"""Query library — every SURVEY.md §2 engine op key, Spark impl + oracle SQL."""

from .registry import REGISTRY, Query, register  # noqa: F401

# Importing the modules populates REGISTRY.
from . import tierb  # noqa: F401,E402
from . import tiera  # noqa: F401,E402
from . import tierc  # noqa: F401,E402

# The driver adjudicates queries() in dict-insertion order and may cap the
# number of keys per round (round 1 stopped at 50, leaving every Tier C key
# and 13 Tier A keys without a driver verdict — see CORRECTNESS_r01.json).
# Front-load the keys that still need a driver verdict: the 35 keys absent
# from CORRECTNESS_r01.json, plus the two keys whose oracles were fixed in
# round 2 (q_agg_modern hash-mismatched; q_agg_approx had no oracle).  Keys
# already green in round 1 follow in their original order — the union of
# CORRECTNESS_r* rows then covers all keys.
_NEEDS_VERDICT = [
    # Tier C (22) — no driver row in round 1
    "x_dedup_exact", "x_dedup_near", "x_dedup_simhash", "x_dedup_ngram",
    "x_dedup_embed", "x_dedup_cluster", "x_sim_topk", "x_sim_ivf",
    "x_sim_ivf2", "x_sim_lsh", "x_text_tf", "x_text_tfidf", "x_text_langid",
    "x_text_quality", "x_text_tokens", "x_text_fingerprint",
    "x_text_repetition", "x_text_line_dedup", "x_text_curate",
    "x_multimodal", "x_multimodal_binary", "x_session",
    # Tier C7 curation ops (6) — new in round 2
    "x_split_hash", "x_pack_sequences", "x_decontaminate", "x_text_pii",
    "x_domain_quota", "x_vocab_topk",
    # Tier C3+ clustering (2) — new in round 2
    "x_kmeans_assign", "x_kmeans_iter",
    # Tier C7 mixture construction (2) — new in round 2
    "x_data_mix", "x_data_upsample",
    # Tier A (13) — no driver row in round 1
    "f_contains", "f_split", "f_element_at", "op_nmea_latlon",
    "op_geocode_join", "op_flatten_soh", "op_alert_filter",
    "op_event_partition", "op_error_route", "snk_stage_parquet",
    "snk_raw_json", "cat_register", "cat_recover",
    # Tier B (2) — oracle fixed this round, needs a fresh verdict
    "q_agg_modern", "q_agg_approx",
    # Round-2 late additions (3) — fills the 50-key window exactly
    "x_quality_model", "x_embed_reduce", "x_url_parse",
]
# Registered beyond the 50-key window this round (locally verified at
# both SFs; rotate to the FRONT of _NEEDS_VERDICT in round 3):
#   x_dataset_card, x_decontaminate_near, x_chunk_documents


def _front_load(priority: list[str]) -> None:
    ordered = {k: REGISTRY[k] for k in priority if k in REGISTRY}
    ordered.update({k: q for k, q in REGISTRY.items() if k not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_front_load(_NEEDS_VERDICT)
