"""Custom Spark 4 Python DataSource for raw NMEA 0183 sentence logs —
``spark.read.format("nmea").load(path)`` returns a typed table of parsed
sentences (talker, sentence type, positional fields, checksum validity).

Why a DataSource and not ``spark.read.text`` + expressions: the reference
ingests NMEA only after two base64 hops inside JSON envelopes
(hello.py:66-79), and that path IS pure expressions here
(operators/classify.py, functions/nmea.py).  But fleet devices also dump
bare ``.nmea`` sentence logs; this source makes those directly queryable
without a staging step — the "another source format" lane of the engine.

Scale design: one ``InputPartition`` per file (the natural split unit for
line logs — same as ``spark.read.text``'s per-file splits for
non-splittable codecs), rows yielded as **Arrow RecordBatches** (the
DataSourceReader fast path: one Arrow exchange per ~10k lines, not one
pickled row per line).  A 100 TB log corpus parallelizes across its file
count; single giant files should be pre-chunked (same advice as gzip
text).

Checksum: standard NMEA ``*hh`` trailer — XOR of the characters between
``$`` and ``*``; ``checksum_ok`` is NULL when the trailer is absent
(many proprietary ``$PIMD8`` feeds omit it, hello.py:79-89 never checks).
"""

from __future__ import annotations

import glob
import os
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_BATCH_LINES = 10_000

_SCHEMA = (
    "file string, line_no int, sentence string, talker string, "
    "sentence_type string, fields array<string>, checksum_ok boolean"
)


def _parse_line(line: str) -> tuple | None:
    s = line.strip()
    if not s or not s.startswith("$"):
        return None
    checksum_ok = None
    body = s[1:]
    if "*" in body:
        body, _, tail = body.rpartition("*")
        want = tail.strip()
        got = 0
        for ch in body:
            got ^= ord(ch)
        try:
            checksum_ok = got == int(want, 16)
        except ValueError:
            checksum_ok = False
    tokens = body.split(",")
    head = tokens[0]
    if head.startswith("P"):  # proprietary: $P + manufacturer code
        talker, stype = "P", head[1:]
    else:  # standard: 2-char talker + 3-char type
        talker, stype = head[:2], head[2:]
    return (s, talker, stype, tokens[1:], checksum_ok)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class NmeaReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("nmea source requires a path: .load('/logs/*.nmea')")

    def partitions(self):
        p = self._path
        if os.path.isdir(p):
            files = sorted(glob.glob(os.path.join(p, "**", "*"), recursive=True))
        else:
            files = sorted(glob.glob(p))
        files = [f for f in files if os.path.isfile(f)]
        if not files:
            raise FileNotFoundError(f"nmea source: no files match {p!r}")
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa

        arrow_schema = pa.schema(
            [
                ("file", pa.string()),
                ("line_no", pa.int32()),
                ("sentence", pa.string()),
                ("talker", pa.string()),
                ("sentence_type", pa.string()),
                ("fields", pa.list_(pa.string())),
                ("checksum_ok", pa.bool_()),
            ]
        )
        rows: list[tuple] = []
        with open(partition.path, "r", errors="replace") as f:
            for i, line in enumerate(f, start=1):
                parsed = _parse_line(line)
                if parsed is None:
                    continue
                rows.append((partition.path, i, *parsed))
                if len(rows) >= _BATCH_LINES:
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(c) for c in zip(*rows)], schema=arrow_schema
                    )
                    rows = []
        if rows:
            yield pa.RecordBatch.from_arrays(
                [pa.array(c) for c in zip(*rows)], schema=arrow_schema
            )


class NmeaDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "nmea"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> NmeaReader:  # noqa: ANN001
        return NmeaReader(self.options)


def register_nmea_source(spark) -> None:  # noqa: ANN001
    """Register ``format("nmea")`` on this session."""
    spark.dataSource.register(NmeaDataSource)
