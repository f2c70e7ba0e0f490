"""Event-time partition-key expressions (SURVEY.md §2 A17).

The reference computes ``year/month/day`` partition keys from the epoch-second
``date_time`` field with a JQ ``strftime`` during Firehose dynamic
partitioning (reference: cdk_datalake_mvp_stack.py:206-214,228-238) — i.e.
**event time**, zero-padded, UTC.  Raw zones instead use wall-clock
*processing* time (hello.py:53,207,218,229); keep the two distinct.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _utc_wall(ts: Column) -> Column:
    """Shift an instant so rendering in the SESSION time zone shows its
    UTC wall-clock fields — makes date_format deployment-independent
    (the JQ strftime reference is UTC; a session in another zone would
    otherwise partition events into the wrong day)."""
    return F.to_utc_timestamp(ts, F.current_timezone())


def event_partition_cols(date_time_epoch: Column | str) -> dict[str, Column]:
    """year/month/day string columns ('2024','01','05') from epoch seconds,
    matching JQ ``strftime("%Y"/"%m"/"%d")`` zero-padding exactly, in UTC
    regardless of ``spark.sql.session.timeZone``."""
    c = F.col(date_time_epoch) if isinstance(date_time_epoch, str) else date_time_epoch
    ts = _utc_wall(F.timestamp_seconds(c))
    return {
        "year": F.date_format(ts, "yyyy"),
        "month": F.date_format(ts, "MM"),
        "day": F.date_format(ts, "dd"),
    }


def processing_partition_cols() -> dict[str, Column]:
    """Processing-time partition keys for the raw zones
    (reference: hello.py:207,218,229 — ``now.strftime``)."""
    now = F.current_timestamp()
    return {
        "year": F.date_format(now, "yyyy"),
        "month": F.date_format(now, "MM"),
        "day": F.date_format(now, "dd"),
    }
