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
# keys per round.  After round 8: ALL 218 keys are green at their latest
# driver check, 0 failures ever.  Round 9 (VERDICT.md r8 "Next round" #1)
# front-loads:
#   1. slots 1-19 = the 19 r4-era rows that slipped past r8's 50-key cut
#      (4 rounds stale; the ONLY keys whose latest driver evidence is
#      r4) — nothing may displace them;
#   2. keys whose OUTPUT changed this round (x_benford order-pinned
#      chi_total_r; x_dp_counts mechanics_only marker column) plus the
#      plan-shape-changed x_theta_intersect (hash-stable, re-adjudicated
#      out of caution) and the round-9 new key x_active_users_hll —
#      names may be listed ahead of registration; _front_load skips
#      unknown keys;
#   3. the r5-era rows (now also 4 rounds old), CORRECTNESS_r05
#      insertion order, minus x_dedup_semantic_guarded (fresh r7 row).
#      19 + 11 + 20 = 50; the trailing listed r5 keys (op_classify,
#      q_agg_grouping_sets …) plus the rest of the r5 block
#      (q_agg_percentile … x_minhash_calibration) lead the r10 queue.
_NEEDS_VERDICT = [
    # r4-era stale rows (r8 VERDICT #1) — MUST hold slots 1-19
    "x_pack_sequences", "x_quality_model", "x_session", "x_sim_ivf",
    "x_sim_lsh", "x_sim_topk", "x_split_hash", "x_text_curate",
    "x_text_fingerprint", "x_text_langid", "x_text_line_dedup",
    "x_text_pii", "x_text_quality", "x_text_repetition", "x_text_tf",
    "x_text_tfidf", "x_text_tokens", "x_url_parse", "x_vocab_topk",
    # round-9 changed / new keys — fresh row needed (Tier M = the
    # round-9 statistics wave: MW rank-sum, DiD, survival, Cramér's V)
    "x_benford", "x_dp_counts", "x_theta_intersect", "x_active_users_hll",
    "x_mann_whitney", "x_diff_in_diff", "x_survival", "x_cramers_v",
    "x_auc", "x_gains_lift", "x_dedup_simhash_rep",
    # r5-era rows (next-oldest), CORRECTNESS_r05 insertion order
    "q_triangle_count", "x_outlier_mad", "q_ts_downsample",
    "x_sample_weighted", "x_decontaminate_bloom", "x_dedup_semantic",
    "x_dedup_lev", "x_sample_stratified", "x_winsorize",
    "x_dedup_containment", "x_drift_psi", "x_dedup_containment_guarded",
    "x_novelty", "x_hard_negatives", "x_lpa", "x_dedup_substring",
    "x_data_temperature", "x_dsir", "x_dedup_substring_guarded",
    "x_label_noise", "x_sim_ivf2", "agg_class_count", "f_from_json",
    "f_isbase64", "f_unbase64", "op_classify", "q_agg_grouping_sets",
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
