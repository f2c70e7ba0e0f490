"""base64 expressions (SURVEY.md §2 A3/A4; reference: hello.py:13-17,66-71).

The reference decides "is this payload double-encoded?" by round-tripping:
``base64.b64encode(base64.b64decode(s)) == s``, with any decode exception
meaning False (hello.py:13-17).  Spark 4's ``unbase64`` raises on invalid
input (ANSI), so we use ``try_to_binary(.., 'base64')`` — NULL on invalid —
which reproduces the exception-as-False semantics as a pure expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def try_unbase64(col: Column | str) -> Column:
    """base64 text -> binary, NULL when not valid base64."""
    return F.try_to_binary(_c(col), F.lit("base64"))


def unbase64_str(col: Column | str) -> Column:
    """Decode base64 text to UTF-8 text; NULL when not valid base64
    (reference: hello.py:66-67,71)."""
    return try_unbase64(col).cast("string")


def is_base64(col: Column | str) -> Column:
    """True iff ``b64encode(b64decode(s)) == s`` (reference: hello.py:13-17).

    Decode leniently (NULL on garbage), re-encode, compare — newline
    chunking stripped from both sides so RFC 2045 wrapping can't produce a
    false negative on long payloads.
    """
    clean = F.regexp_replace(_c(col), r"[\r\n]", "")
    decoded = F.try_to_binary(clean, F.lit("base64"))
    roundtrip = F.regexp_replace(F.base64(decoded), r"[\r\n]", "")
    return F.when(decoded.isNull(), F.lit(False)).otherwise(roundtrip == clean)
