"""Query library — every SURVEY.md §2 engine op key, Spark impl + oracle SQL."""

from .registry import REGISTRY, Query, register  # noqa: F401

# Importing the modules populates REGISTRY.
from . import tierb  # noqa: F401,E402
from . import tiera  # noqa: F401,E402
from . import tierc  # noqa: F401,E402
from . import tierd  # noqa: F401,E402

# The driver adjudicates queries() in dict-insertion order and caps at 50
# keys per round.  The union of CORRECTNESS_r01+r02 covers 98/101 keys, all
# green.  Round 3 front-loads ONLY the keys without a driver row yet: the 3
# round-2 late additions, then every key first registered in round 3.  All
# already-green keys follow in registration order — re-adjudicating them is
# free coverage if the window has room, but they pay no window rent.
# (x_sim_ivf2, green r2, now sits at the back: it is a probe-knob variant of
# x_sim_ivf and must never displace a first-verdict key again.)
_NEEDS_VERDICT = [
    # Round-2 late additions (3) — registered beyond round 2's full window
    "x_dataset_card", "x_decontaminate_near", "x_chunk_documents",
    # Round-3 additions — each needs its first driver row
    "x_multimodal_decode",
    "x_dedup_ledger_near",
    # Round-3 Tier D analytics extensions
    "q_funnel",
    "q_retention",
    "q_gapfill",
    "x_scd2",
    "x_bm25",
    "x_surprisal",
    "x_dedup_best",
    "x_zorder",
    "x_pagerank",
    "q_merge",
    "q_pattern_match",
    "q_agg_approx_quantile",
    "x_ann_recall",
    "q_fn_variant",
    "x_data_checks",
    "x_dedup_url",
    "q_histogram",
    "q_join_asof_near",
]


# Redundant probe-knob variants: keep registered (they are real capability)
# but last, so a re-adjudication slot is never spent on them before every
# distinct operator has been re-greened.
_BACK = ["x_sim_ivf2"]


def _front_load(priority: list[str], back: list[str]) -> None:
    ordered = {k: REGISTRY[k] for k in priority if k in REGISTRY}
    ordered.update(
        {k: q for k, q in REGISTRY.items() if k not in ordered and k not in back}
    )
    ordered.update({k: REGISTRY[k] for k in back if k in REGISTRY})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_front_load(_NEEDS_VERDICT, _BACK)
