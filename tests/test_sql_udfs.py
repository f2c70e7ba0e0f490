"""SQL scalar UDF surface: registered functions must agree with the
DataFrame expression library on the same inputs (and inline as
expressions — no Python UDF nodes in the plan)."""

from __future__ import annotations

import base64

import pytest
from pyspark.sql import functions as F

from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.functions.base64_fns import (
    is_base64,
)
from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.functions.nmea import (
    nmea_tokens,
    signed_latitude,
    signed_longitude,
)
from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.functions.sql_udfs import (
    register_sql_functions,
)
from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.functions.vectors import (
    cosine_similarity,
)


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    names = register_sql_functions(spark)
    assert len(names) == 11
    return names


def test_base64_functions_match_library(spark):
    enc = base64.b64encode(b"hello world").decode()
    df = spark.createDataFrame([(enc,), ("not base64!!",)], ["s"])
    df.createOrReplaceTempView("v_b64")
    sql = spark.sql(
        "SELECT s, is_base64(s) AS ok, unbase64_str(s) AS dec FROM v_b64"
    ).collect()
    lib = df.select("s", is_base64("s").alias("ok")).collect()
    assert [(r["s"], r["ok"]) for r in sql] == [(r["s"], r["ok"]) for r in lib]
    assert sql[0]["dec"] == "hello world"


def test_nmea_functions_match_library(spark):
    rows = [
        ("$PIMD8,01,02,ab,cd,47.60,N,122.33,W,5.5,end",),
        ("$PIMD8,01,02,ab,cd,33.85,S,151.21,E,5.5,end",),
        ("$PIMD8,truncated",),
    ]
    df = spark.createDataFrame(rows, ["sentence"])
    df.createOrReplaceTempView("v_nmea")
    sql = spark.sql(
        "SELECT nmea_signed_lat(sentence) AS lat, nmea_signed_lon(sentence) AS lon FROM v_nmea"
    ).collect()
    toks = nmea_tokens("sentence")
    lib = df.select(
        signed_latitude(toks).alias("lat"), signed_longitude(toks).alias("lon")
    ).collect()
    assert [(r["lat"], r["lon"]) for r in sql] == [(r["lat"], r["lon"]) for r in lib]
    assert sql[0]["lat"] == 47.60 and sql[0]["lon"] == -122.33
    assert sql[1]["lat"] == -33.85 and sql[1]["lon"] == 151.21
    assert sql[2]["lat"] is None  # truncated sentence → NULL, no ANSI crash


def test_partition_and_text_functions(spark):
    sql = spark.sql(
        """SELECT event_year(1700000000) AS y, event_month(1700000000) AS m,
                  event_day(1700000000) AS d,
                  token_count('  a b   c ') AS tc,
                  doc_fingerprint('A  b') AS fp1, doc_fingerprint('a b ') AS fp2"""
    ).first()
    assert (sql["y"], sql["m"], sql["d"]) == ("2023", "11", "14")
    assert sql["tc"] == 3
    assert sql["fp1"] == sql["fp2"]  # whitespace/case-normalized


def test_cosine_sim_matches_library_and_handles_zero(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [3.0, 2.0, 1.0]), ([1.0, 0.0, 0.0], [0.0, 0.0, 0.0])],
        "a array<float>, b array<float>",
    )
    df.createOrReplaceTempView("v_vec")
    sql = spark.sql("SELECT round(cosine_sim(a, b), 6) AS s FROM v_vec").collect()
    lib = df.select(
        F.round(cosine_similarity(F.col("a"), F.col("b")), 6).alias("s")
    ).collect()
    assert [r["s"] for r in sql] == [r["s"] for r in lib]
    assert sql[1]["s"] is None  # zero-norm → NULL


def test_sql_udfs_inline_no_python_udf(spark):
    from conftest import plan_of

    df = spark.sql("SELECT haversine_km(47.6, -122.3, 40.7, -74.0) AS km")
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert round(df.first()["km"], 1) == 3864.3
