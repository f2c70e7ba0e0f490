"""Threshold alert predicates (SURVEY.md §2 A14; reference:
hello.py:112-116,181-192 — SNS publishes commented out, thresholds latent).

Alert conditions on stage rows:
- low solar:   solar_panel_voltage < 12
- low battery: battery_voltage < 4

In streaming these run as a filter inside foreachBatch feeding an alert
sink; in batch they are a plain filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LOW_SOLAR_V = 12.0
LOW_BATTERY_V = 4.0


def alert_rows(stage: DataFrame) -> DataFrame:
    """Stage rows that trip a threshold, tagged with alert_type."""
    low_solar = F.col("solar_panel_voltage") < LOW_SOLAR_V
    low_batt = F.col("battery_voltage") < LOW_BATTERY_V
    return (
        stage.filter(low_solar | low_batt)
        .withColumn(
            "alert_type",
            F.when(low_batt & low_solar, F.lit("low_battery+low_solar"))
            .when(low_batt, F.lit("low_battery"))
            .otherwise(F.lit("low_solar")),
        )
    )
