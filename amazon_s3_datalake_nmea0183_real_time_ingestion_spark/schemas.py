"""Declared schemas (SURVEY.md §1).

The reference declares the analytic ``stage`` table externally in Glue
(reference: cdk_datalake_mvp/cdk_datalake_mvp_stack.py:371-493) — a flat
30-column schema of int/double/string only.  We transcribe it exactly, in
declaration order.  The in-flight envelope and SOH payload shapes come from
the transform Lambda (reference: cdk_datalake_mvp/lambda/hello.py:64-175).
Schemas are *declared*, never inferred, on the hot path (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# Ingest envelope — one row per device message as delivered to the transform
# (reference: hello.py:64-67,140-145).  `data` is base64 text; for sensor
# messages it is base64-of-base64 (hello.py:68-71).
# ---------------------------------------------------------------------------
ENVELOPE_SCHEMA = StructType(
    [
        StructField("recordId", StringType()),
        StructField("packetId", IntegerType()),
        StructField("deviceType", IntegerType()),
        StructField("deviceId", IntegerType()),
        StructField("userApplicationId", IntegerType()),
        StructField("organizationId", IntegerType()),
        StructField("len", IntegerType()),
        StructField("status", IntegerType()),
        StructField("hiveRxTime", StringType()),
        StructField("data", StringType()),
    ]
)

# ---------------------------------------------------------------------------
# SOH (state-of-health) inner payload — decoded from `data` on the SOH branch
# (reference: hello.py:133,146-167).  Short keys → flattened stage names.
# ---------------------------------------------------------------------------
SOH_SCHEMA = StructType(
    [
        StructField("ln", DoubleType()),   # longitude
        StructField("lt", DoubleType()),   # latitude
        StructField("si", DoubleType()),   # solar_panel_current
        StructField("bi", DoubleType()),   # battery_current
        StructField("sv", DoubleType()),   # solar_panel_voltage
        StructField("bv", DoubleType()),   # battery_voltage
        StructField("d", IntegerType()),   # date_time (epoch seconds)
        StructField("n", IntegerType()),   # no_messages_sent_since_last_power_cycle
        StructField("a", DoubleType()),    # altitude
        StructField("s", DoubleType()),    # speed
        StructField("c", DoubleType()),    # course
        StructField("r", IntegerType()),   # last_rssi_value
        StructField("ti", DoubleType()),   # modem_current
    ]
)

# Mapping short SOH key -> stage column (reference: hello.py:146-167).
SOH_TO_STAGE = {
    "ln": "longitude",
    "lt": "latitude",
    "si": "solar_panel_current",
    "bi": "battery_current",
    "sv": "solar_panel_voltage",
    "bv": "battery_voltage",
    "d": "date_time",
    "n": "no_messages_sent_since_last_power_cycle",
    "a": "altitude",
    "s": "speed",
    "c": "course",
    "r": "last_rssi_value",
    "ti": "modem_current",
}

# ---------------------------------------------------------------------------
# stage — the 30-column analytic fact table, exactly as declared in Glue
# (reference: cdk_datalake_mvp_stack.py:371-493), in declaration order.
# `date_time` stays IntegerType (epoch seconds) for fidelity; event-time
# TimestampType is derived, not stored (SURVEY.md §1.2).
# ---------------------------------------------------------------------------
STAGE_SCHEMA = StructType(
    [
        StructField("packetid", IntegerType()),
        StructField("devicetype", IntegerType()),
        StructField("deviceid", IntegerType()),
        StructField("userapplicationid", IntegerType()),
        StructField("organizationid", IntegerType()),
        StructField("len", IntegerType()),
        StructField("status", IntegerType()),
        StructField("hiverxtime", StringType()),
        StructField("longitude", DoubleType()),
        StructField("latitude", DoubleType()),
        StructField("addressnumber", StringType()),
        StructField("street", StringType()),
        StructField("municipality", StringType()),
        StructField("region", StringType()),
        StructField("subregion", StringType()),
        StructField("postalcode", StringType()),
        StructField("country", StringType()),
        StructField("timezone_name", StringType()),
        StructField("timezone_offset", IntegerType()),
        StructField("solar_panel_current", DoubleType()),
        StructField("battery_current", DoubleType()),
        StructField("solar_panel_voltage", DoubleType()),
        StructField("battery_voltage", DoubleType()),
        StructField("date_time", IntegerType()),
        StructField("no_messages_sent_since_last_power_cycle", IntegerType()),
        StructField("altitude", DoubleType()),
        StructField("speed", DoubleType()),
        StructField("course", DoubleType()),
        StructField("last_rssi_value", IntegerType()),
        StructField("modem_current", DoubleType()),
    ]
)

STAGE_COLUMNS = [f.name for f in STAGE_SCHEMA.fields]

# Geo enrichment columns produced by the (replaced) reverse-geocode lookup
# (reference: hello.py:148-156 — Amazon Location Place fields).
GEO_COLUMNS = [
    "addressnumber",
    "street",
    "municipality",
    "region",
    "subregion",
    "postalcode",
    "country",
    "timezone_name",
    "timezone_offset",
]

# Message classes (reference: hello.py:69,73,121,128).
CLASS_SOH = "soh"
CLASS_SENSOR = "sensor"
CLASS_UNKNOWN = "unknown"
