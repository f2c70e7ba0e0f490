"""Product quantization (PQ) for 100 TB vector stores — m subspace
codebooks + asymmetric-distance search (Jégou, Douze & Schmid,
"Product quantization for nearest neighbor search", TPAMI'11).

Where scalar quantization (operators/quantization.py) snaps each
DIMENSION to an affine grid (4× compression at 8 bits/dim), PQ splits
each vector into ``m`` contiguous sub-vectors and snaps each SUB-VECTOR
to its nearest entry of a per-subspace codebook learned by k-means:
storage is ``m·log2(ksub)`` bits per vector (64-dim float32 at m=8,
ksub=16 → 8 four-bit codes = 4 bytes, 64× compression; the classic
ksub=256 setting costs 8 bytes, 32×) plus an m × ksub × (dim/m)
codeword table measured in KBs.  Search keeps queries full-precision and scores against the
reconstruction (decode = concatenate the coded codewords) — the ADC
regime; the classic LUT acceleration (per query, precompute the m × ksub
partial-distance table, then score each corpus vector with m lookups)
is a kernel-level rewrite of the SAME arithmetic and changes no
semantics, so the declarative form below IS the contract the LUT kernel
would have to match.

Scale shape: codebook training is ONE corpus shuffle (the per-(subspace,
code, position) mean aggregation — map-side combinable, output
m × ksub × dim/m rows); seed assignment and final encoding are pure
map-side HOF expressions against the 1-row broadcast codebook nest —
inside whole-stage codegen, no Python, nothing corpus-proportional ever
collected.  This mirrors the IVF economics (operators/similarity.py):
the learned table is k-proportional, not n-proportional, so broadcast is
the RIGHT plan at any corpus size.

Determinism contract (registry.py): distances are round(·, 6) float64
with ties → lowest code_id (strict-< fold over a code_id-ascending
array); codeword means are round(avg, 6); element order is list order —
the DuckDB oracle replays every stage bit-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double


def _sqdist(sub: Column, cw: Column) -> Column:
    """round(squared L2, 6) between two equal-length double arrays —
    left-to-right float64 fold, the engine-independent form."""
    diffs = F.zip_with(sub, cw, lambda a, b: (a - b) * (a - b))
    return F.round(F.aggregate(diffs, F.lit(0.0), lambda acc, e: acc + e), 6)


def _nest_codebooks(codebooks: DataFrame) -> DataFrame:
    """(subspace, code_id, codeword) rows → ONE row holding
    ``cbs: array<struct<subspace, cs: array<struct<code_id, codeword>>>>``
    with both levels ascending — the broadcastable form the map-side HOFs
    fold over.  array_sort on structs orders by the first field, so
    subspace / code_id order is exact, not collation luck."""
    return (
        codebooks.groupBy("subspace")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("code_id", "codeword"))
            ).alias("cs")
        )
        .agg(
            F.array_sort(F.collect_list(F.struct("subspace", "cs"))).alias("cbs")
        )
    )


def _encode_col(x: Column, cbs: Column, m: int, dsub: int) -> Column:
    """``array<int>`` of per-subspace nearest-code ids for double vector
    ``x`` against the nested codebook column — a pure codegen HOF chain:
    for each subspace, fold its (code_id-ascending) codeword list
    carrying (best_id, best_dist); strict < keeps the LOWEST code_id on
    round-6 ties, matching the oracle's ORDER BY dist ASC, code_id ASC."""
    init = F.struct(
        F.lit(-1).cast("int").alias("id"),
        F.lit(None).cast("double").alias("d"),
    )

    def best_for(entry):  # entry: struct<subspace, cs>
        sub = F.slice(x, entry["subspace"] * dsub + 1, dsub)
        return F.aggregate(
            entry["cs"],
            init,
            lambda acc, c: F.when(
                (acc["id"] < 0) | (_sqdist(sub, c["codeword"]) < acc["d"]),
                F.struct(
                    c["code_id"].cast("int").alias("id"),
                    _sqdist(sub, c["codeword"]).alias("d"),
                ),
            ).otherwise(acc),
        )["id"]

    return F.transform(cbs, best_for)


def _decode_col(codes: Column, cbs: Column, m: int) -> Column:
    """Reconstruction: concatenate each coded subspace's codeword —
    ``flatten`` of per-subspace lookups (filter-by-code_id, first hit)."""
    return F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.element_at(
                F.filter(
                    F.element_at(cbs, s + 1)["cs"],
                    lambda c: c["code_id"] == F.element_at(codes, s + 1),
                ),
                1,
            )["codeword"],
        )
    )


def pq_train(df: DataFrame, dim: int, m: int = 8, ksub: int = 16,
             id_col: str = "vec_id", vec_col: str = "embedding",
             iters: int = 1) -> DataFrame:
    """Learn per-subspace codebooks: deterministic seeding (the ``ksub``
    lowest-id vectors' sub-vectors, code_id = their id — the
    seed_centroids convention) + ``iters`` Lloyd rounds of squared-L2
    assignment and per-position means (round 6).  Returns (subspace,
    code_id, codeword) rows — m × ksub × (dim/m) doubles, KBs.

    Each round costs one corpus shuffle (the mean agg; assignment rides
    map-side on the broadcast nest).  Codes that lose every member drop
    out, standard Lloyd — code_ids are identities, not positions, so a
    sparse codebook encodes/decodes unambiguously.
    """
    assert dim % m == 0, "dim must split evenly into m subspaces"
    dsub = dim // m
    dv = as_double(F.col(vec_col))
    subspaces = list(range(m))
    cb = df.filter(F.col(id_col) < ksub).select(
        *[
            F.struct(
                F.lit(s).alias("subspace"),
                F.col(id_col).cast("int").alias("code_id"),
                F.slice(dv, s * dsub + 1, dsub).alias("codeword"),
            ).alias(f"__s{s}")
            for s in subspaces
        ]
    ).select(F.explode(F.array(*[f"__s{s}" for s in subspaces])).alias("e")).select(
        "e.subspace", "e.code_id", "e.codeword"
    )
    for _ in range(iters):
        nest = _nest_codebooks(cb)
        coded = df.crossJoin(F.broadcast(nest)).select(
            F.col(id_col),
            _encode_col(dv, F.col("cbs"), m, dsub).alias("__codes"),
            dv.alias("__dv"),
        )
        # one shuffle: (subspace, code, position-within-subspace) means
        sub_rows = coded.select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda s: F.struct(
                        F.element_at(F.col("__codes"), s + 1).alias("code"),
                        F.slice(F.col("__dv"), s * dsub + 1, dsub).alias("sv"),
                    ),
                )
            ).alias("subspace", "e"),
        )
        el = sub_rows.select(
            "subspace", F.col("e.code").alias("code_id"),
            F.posexplode("e.sv").alias("pos", "x"),
        )
        cb = (
            el.groupBy("subspace", "code_id", "pos")
            .agg(F.round(F.avg("x"), 6).alias("mval"))
            .groupBy("subspace", "code_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mval"))),
                    lambda s: s["mval"],
                ).alias("codeword")
            )
        )
    return cb


def pq_encode(df: DataFrame, codebooks: DataFrame, dim: int, m: int = 8,
              vec_col: str = "embedding") -> DataFrame:
    """Attach ``pq_codes`` (array<int>, the m-byte stored form) and
    ``pq_recon`` (array<double>, the decoded view ADC search scores
    against) — map-side only, 1-row codebook nest broadcast."""
    dsub = dim // m
    nest = _nest_codebooks(codebooks)
    out = df.crossJoin(F.broadcast(nest))
    codes = _encode_col(as_double(F.col(vec_col)), F.col("cbs"), m, dsub)
    return out.select(
        *df.columns,
        codes.alias("pq_codes"),
        _decode_col(codes, F.col("cbs"), m).alias("pq_recon"),
    )


def pq_report(df: DataFrame, codebooks: DataFrame, dim: int, m: int = 8,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Per-vector PQ audit: the code string (``c0-c1-…``, the stored
    bytes made hash-comparable), reconstruction MSE, worst absolute
    component error, and cosine fidelity — the commit gate before
    switching a store to the 32×-smaller coded layout (pair with
    x_sim_pq's search-recall measurement, the quantization.py pattern).

    Zero-norm vectors: try_divide → NULL fidelity; oracles CASE the same
    rows to NULL (the x_embed_quantize cross-engine alignment)."""
    q = pq_encode(df, codebooks, dim, m, vec_col)
    dv = as_double(F.col(vec_col))
    err = F.zip_with(dv, F.col("pq_recon"), lambda a, b: a - b)
    sse = F.aggregate(
        F.transform(err, lambda e: e * e), F.lit(0.0), lambda acc, e: acc + e
    )
    dot = F.aggregate(
        F.zip_with(dv, F.col("pq_recon"), lambda a, b: a * b),
        F.lit(0.0), lambda acc, p: acc + p,
    )
    nrm = lambda v: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(v, lambda e: e * e), F.lit(0.0), lambda acc, e: acc + e
    ))
    return q.select(
        F.col(id_col),
        F.array_join(F.col("pq_codes"), "-").alias("codes"),
        F.round(sse / F.size(dv), 9).alias("mse"),
        F.round(F.array_max(F.transform(err, lambda e: F.abs(e))), 6).alias(
            "max_abs_err"
        ),
        F.round(F.try_divide(dot, nrm(dv) * nrm(F.col("pq_recon"))), 6).alias(
            "cos_fidelity"
        ),
    )
