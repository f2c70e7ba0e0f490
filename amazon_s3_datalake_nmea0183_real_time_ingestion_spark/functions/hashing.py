"""Portable deterministic hashing (engine-independent).

MinHash / SimHash / fingerprinting need hash functions that are *stable and
reproducible outside Spark* so results can be verified against any ANSI-SQL
oracle.  Spark's builtin ``hash``/``xxhash64`` are Spark-specific, so we
derive integer hashes from ``md5`` (identical everywhere):

- ``md5_u32(c)``  : first 8 hex chars of md5 → unsigned 32-bit int.
- ``md5_i64(c)``  : first 15 hex chars → int64 in [0, 2^60) (sign-safe).
- ``minhash_permuted(h, i)`` : universal-hash permutation
  ``(a_i * h + b_i) mod P`` with ``P = 2^31 - 1`` (Mersenne prime) and
  deterministic per-permutation coefficients.  All intermediates stay below
  2^62, so int64 arithmetic never overflows — the same formula evaluates
  identically in Spark SQL, DuckDB, Trino, or plain Python.

The mirrored SQL snippets live in ``plans/oracle_fragments.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1
_LCG_A = 1_103_515_245
_LCG_C = 12_345


def md5_u32(col: Column | str) -> Column:
    """Unsigned 32-bit hash of a string column via md5 prefix."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def md5_i64(col: Column | str) -> Column:
    """60-bit non-negative hash of a string column via md5 prefix."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def perm_coeff_a(i: int) -> int:
    """Deterministic multiplier for permutation i (non-zero, < P)."""
    return (_LCG_A * (i + 1) + _LCG_C) % MERSENNE_P or 1


def perm_coeff_b(i: int) -> int:
    """Deterministic offset for permutation i (< P)."""
    return (_LCG_A * (i + 1_000_003) + _LCG_C) % MERSENNE_P


def minhash_permuted(hash_col: Column, i: int) -> Column:
    """Apply universal-hash permutation i to a non-negative int64 hash."""
    a, b = perm_coeff_a(i), perm_coeff_b(i)
    return (F.lit(a) * (hash_col % MERSENNE_P) + F.lit(b)) % MERSENNE_P
