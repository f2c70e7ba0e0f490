#!/usr/bin/env python
"""sf1-vs-sf2 doubling probe: engine-side wall time of the heaviest
registry keys at 2x the sf1 perf dataset (round-12 evidence; SCALE.md
§7s table).

Answers the question the per-round bench can't: when the data DOUBLES,
does each expensive key's wall time grow by its documented complexity
bound or worse?  Ratios at or below the 2.0 data ratio mean the plan's
scaling story holds at the next decade step; q_triangle_count is graded
against its O(m^1.5) worst case (2^1.5 ≈ 2.83) rather than 2.0.

Timing follows bench.py's convention exactly: noop-sink writes (full
pipeline executes, rows discarded), min-of-2 per (key, sf), one warmup
query before the timed loops.  Build the inputs first:

    python tools/make_sfscale.py --copies 10                    # sf1
    python tools/make_sfscale.py --copies 20 --out .scratch/sf2 # sf2
    SPARK_GRAFT_DRIVER_MEM=24g python tools/sfscale_probe.py [keys...]

Emits one JSON line per key ({key: {sf1, sf2, ratio}}) and a FINAL
summary line.

Known noise mode (measured r13, SCALE.md §7t): keys that lazy-
localCheckpoint corpus-scale frames leave their blocks in the shared
session's storage until GC, so a LATER key's sf1 reading can inherit
memory pressure its sf2 reading escapes (x_dedup_semantic_guarded read
0.42 in-wave vs 1.42 solo).  Before believing any surprising ratio —
especially an inversion (<1) or a cliff (>2) — re-measure that key
SOLO (single-key invocation = fresh JVM), exactly as bench.py's
full-run-to-full-run rule.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

# default roster: the per-round bench's most expensive keys — the ones
# whose complexity claims carry the 100 TB argument
DEFAULT_KEYS = [
    "q_triangle_count",
    "x_dedup_census",
    "x_dedup_best_guarded",
    "x_dedup_cluster_star",
    "x_kcore",
    "x_lpa",
    "x_curate_corpus",
    "x_split_cluster_safe",
    "x_dedup_simhash_rep",
]
# the doubling PAIR is overridable so the same tool measures a SECOND
# doubling (e.g. sf2 → sf4 via `make_sfscale.py --copies 40`): set
# SFSCALE_A_DIR / SFSCALE_B_DIR; the ratio is always B/A and the labels
# in the output follow the dir basenames (ADVICE r13: basenames are
# display labels only — if they collide, e.g. a trailing slash or two
# dirs sharing a name, the pair is disambiguated rather than silently
# collapsing the dict to one entry)
def _build_dirs() -> dict[str, str]:
    a = os.environ.get("SFSCALE_A_DIR", os.path.join(_REPO, ".scratch", "sf1"))
    b = os.environ.get("SFSCALE_B_DIR", os.path.join(_REPO, ".scratch", "sf2"))
    la = os.path.basename(a.rstrip(os.sep)) or "A"
    lb = os.path.basename(b.rstrip(os.sep)) or "B"
    if la == lb:
        la, lb = f"A:{la}", f"B:{lb}"
    dirs = {la: a, lb: b}
    assert len(dirs) == 2, (
        f"A/B dataset labels collapsed: SFSCALE_A_DIR={a!r} "
        f"SFSCALE_B_DIR={b!r}"
    )
    return dirs


DIRS = _build_dirs()


def main() -> int:
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.session import get_spark
    import __spark_entry__ as entrymod

    keys = sys.argv[1:] or DEFAULT_KEYS
    missing = [sf for sf, d in DIRS.items() if not os.path.isdir(d)]
    if missing:
        print(f"missing perf dataset dir(s): {missing} — run make_sfscale.py")
        return 2
    spark = get_spark("sfscale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    unknown = [k for k in keys if k not in qs]
    if unknown:
        print(f"unknown key(s): {unknown}")
        return 2

    label_a, label_b = list(DIRS)  # insertion order: A then B
    # warmup (JIT/codegen) outside the timed loops
    qs["q_agg_basic"](spark, DIRS[label_a]).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict] = {}
    for key in keys:
        out[key] = {}
        for sf, d in DIRS.items():
            best = None
            for _ in range(2):  # min-of-2, the bench convention
                t0 = time.perf_counter()
                qs[key](spark, d).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[key][sf] = round(best, 2)
        out[key]["ratio"] = round(out[key][label_b] / out[key][label_a], 2)
        print(json.dumps({key: out[key]}), flush=True)

    print("FINAL " + json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
