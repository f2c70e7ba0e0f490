"""SQL-callable function surface (Spark 4 SQL scalar UDFs: ``CREATE
FUNCTION ... RETURNS ... RETURN <expr>``).

The reference's query layer is plain Athena SQL
(cdk_datalake_mvp_stack.py:63,68); exposing the engine's expression
library as catalog functions gives pure-SQL users the same NMEA/base64/
geo/text capabilities the DataFrame API has — with NO slow path: SQL
UDFs inline into the plan as expressions (Catalyst-optimized,
codegen'd), unlike Python UDFs.

Usage::

    register_sql_functions(spark)
    spark.sql("SELECT nmea_signed_lat(sentence) FROM raw_sensor")
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Each entry: (name, arg signature, return type, body expression).
_FUNCTIONS: list[tuple[str, str, str, str]] = [
    (
        "is_base64",
        "(s STRING)",
        "BOOLEAN",
        """
        CASE WHEN try_to_binary(regexp_replace(s, '[\\r\\n]', ''), 'base64') IS NULL
             THEN false
             ELSE regexp_replace(base64(try_to_binary(regexp_replace(s, '[\\r\\n]', ''), 'base64')), '[\\r\\n]', '')
                  = regexp_replace(s, '[\\r\\n]', '')
        END
        """,
    ),
    (
        "unbase64_str",
        "(s STRING)",
        "STRING",
        "CAST(try_to_binary(s, 'base64') AS STRING)",
    ),
    (
        "nmea_signed_lat",
        "(sentence STRING)",
        "DOUBLE",
        """
        try_cast(CASE WHEN substring(try_element_at(split(sentence, ','), 7), 1, 1) = 'S'
                      THEN concat('-', try_element_at(split(sentence, ','), 6))
                      ELSE try_element_at(split(sentence, ','), 6) END AS DOUBLE)
        """,
    ),
    (
        "nmea_signed_lon",
        "(sentence STRING)",
        "DOUBLE",
        """
        try_cast(CASE WHEN substring(try_element_at(split(sentence, ','), 9), 1, 1) = 'W'
                      THEN concat('-', try_element_at(split(sentence, ','), 8))
                      ELSE try_element_at(split(sentence, ','), 8) END AS DOUBLE)
        """,
    ),
    (
        "haversine_km",
        "(lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE)",
        "DOUBLE",
        """
        6371.0 * 2 * asin(sqrt(
          pow(sin(radians(lat2 - lat1) / 2), 2) +
          cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon1) / 2), 2)))
        """,
    ),
    # to_utc_timestamp(ts, current_timezone()) renders UTC fields no matter
    # the session time zone (same trick as datetime_fns._utc_wall).
    (
        "event_year",
        "(epoch_s BIGINT)",
        "STRING",
        "date_format(to_utc_timestamp(timestamp_seconds(epoch_s), current_timezone()), 'yyyy')",
    ),
    (
        "event_month",
        "(epoch_s BIGINT)",
        "STRING",
        "date_format(to_utc_timestamp(timestamp_seconds(epoch_s), current_timezone()), 'MM')",
    ),
    (
        "event_day",
        "(epoch_s BIGINT)",
        "STRING",
        "date_format(to_utc_timestamp(timestamp_seconds(epoch_s), current_timezone()), 'dd')",
    ),
    (
        "token_count",
        "(text STRING)",
        "INT",
        r"size(filter(split(lower(text), '\\s+'), x -> x <> ''))",
    ),
    (
        "doc_fingerprint",
        "(text STRING)",
        "STRING",
        r"md5(trim(regexp_replace(lower(text), '\\s+', ' ')))",
    ),
    (
        "cosine_sim",
        "(a ARRAY<FLOAT>, b ARRAY<FLOAT>)",
        "DOUBLE",
        """
        try_divide(
          aggregate(zip_with(transform(a, x -> CAST(x AS DOUBLE)),
                             transform(b, x -> CAST(x AS DOUBLE)),
                             (x, y) -> x * y),
                    CAST(0.0 AS DOUBLE), (acc, x) -> acc + x),
          sqrt(aggregate(transform(a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                         CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)) *
          sqrt(aggregate(transform(b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                         CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)))
        """,
    ),
]


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the engine's SQL function surface as TEMPORARY functions
    in the session; returns the registered names."""
    names = []
    for name, sig, ret, body in _FUNCTIONS:
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURNS {ret} RETURN {body}"
        )
        names.append(name)
    return names
