"""Custom Python DataSource (format 'nmea'): raw sentence logs become a
typed table; checksum validation, proprietary vs standard talker split,
per-file partitions."""

from pyspark.sql import functions as F

from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.nmea_source import (
    register_nmea_source,
)


def _checksum(body: str) -> str:
    c = 0
    for ch in body:
        c ^= ord(ch)
    return f"{c:02X}"


def test_nmea_source_reads_typed_rows(spark, tmp_path):
    good_body = "GPGGA,123519,4807.038,N,01131.000,E,1,08,0.9,545.4,M"
    lines = [
        f"${good_body}*{_checksum(good_body)}",      # valid checksum
        f"${good_body}*00",                           # corrupt checksum
        "$PIMD8,01,02,ab,cd,47.60,N,122.33,W,5.5,end",  # proprietary, no checksum
        "garbage line no dollar",                     # skipped
        "",                                           # skipped
    ]
    d = tmp_path / "logs"
    d.mkdir()
    (d / "a.nmea").write_text("\n".join(lines) + "\n")
    (d / "b.nmea").write_text("$PIMD9,status,ok\n")

    register_nmea_source(spark)
    df = spark.read.format("nmea").load(str(d))
    rows = {(r["file"].rsplit("/", 1)[-1], r["line_no"]): r for r in df.collect()}

    assert len(rows) == 4  # two non-sentence lines skipped
    gga_ok = rows[("a.nmea", 1)]
    assert (gga_ok["talker"], gga_ok["sentence_type"], gga_ok["checksum_ok"]) == ("GP", "GGA", True)
    assert gga_ok["fields"][0] == "123519"
    assert rows[("a.nmea", 2)]["checksum_ok"] is False
    pimd8 = rows[("a.nmea", 3)]
    assert (pimd8["talker"], pimd8["sentence_type"]) == ("P", "IMD8")
    assert pimd8["checksum_ok"] is None
    assert pimd8["fields"][4:8] == ["47.60", "N", "122.33", "W"]
    assert rows[("b.nmea", 1)]["sentence_type"] == "IMD9"

    # per-file partitions: parallelism = file count
    assert df.rdd.getNumPartitions() == 2


def test_nmea_source_composes_with_engine_exprs(spark, tmp_path):
    """The source's output feeds the same sign-fix expressions the ingest
    pipeline uses (functions/nmea.py) — no staging hop."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.functions.nmea import (
        signed_latitude, signed_longitude,
    )

    d = tmp_path / "logs2"
    d.mkdir()
    (d / "x.nmea").write_text(
        "$PIMD8,01,02,ab,cd,47.60,S,122.33,W,5.5,end\n"
    )
    register_nmea_source(spark)
    df = spark.read.format("nmea").load(str(d))
    toks = F.split(F.col("sentence"), ",")
    out = df.select(
        signed_latitude(toks).alias("lat"),
        signed_longitude(toks).alias("lon"),
    ).collect()[0]
    assert (out["lat"], out["lon"]) == (-47.60, -122.33)


def test_nmea_source_edge_files(spark, tmp_path):
    """Empty files, no-sentence files, and malformed checksum hex must not
    crash the reader — rows skipped / checksum_ok=false respectively."""
    d = tmp_path / "edges"
    d.mkdir()
    (d / "empty.nmea").write_text("")
    (d / "garbage.nmea").write_text("no dollar lines here\n\n")
    (d / "badsum.nmea").write_text("$PIMD8,a,b*ZZ\n")
    register_nmea_source(spark)
    df = spark.read.format("nmea").load(str(d))
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["checksum_ok"] is False
