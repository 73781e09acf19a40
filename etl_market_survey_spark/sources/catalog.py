"""Directory catalog scan (SURVEY S8; reference measurements.py:269-301).

Builds the ``measurements_catalog`` table (FIXTURES.md §7) from a data
directory: one row per measurement directory, classified by the name
grammar + filesystem probes.

The directory listing is a driver-side metadata walk (same as the
reference, and the same as any Spark catalog/manifest build); everything
after it is a DataFrame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.strings import classify_measurement, device_tokens, when_from_name


def build_catalog(spark: SparkSession, data_dir: str) -> DataFrame:
    """Scan ``data_dir`` for measurement directories -> catalog DataFrame:
    (Measurement name, Measurement when, Measurement type,
    Measured device(s))."""
    entries = []
    for name in sorted(os.listdir(data_dir)):
        full = os.path.join(data_dir, name)
        if not os.path.isdir(full):
            continue
        subdirs = {d for d in os.listdir(full) if os.path.isdir(os.path.join(full, d))}
        # the reference's filesystem probes (measurements.py:45,49,51)
        entries.append(
            (
                name,
                "iv_curve" in subdirs,
                "scan_1D" in subdirs,
                "scan_1D_sweeping_bias_voltage" in subdirs,
            )
        )
    if not entries:
        return spark.createDataFrame(
            [], "`Measurement name` string, `Measurement when` timestamp, "
                "`Measurement type` string, `Measured device(s)` array<string>"
        )
    df = spark.createDataFrame(
        entries, "name string, has_iv boolean, has_1d boolean, has_1d_sweep boolean"
    )
    return df.select(
        F.col("name").alias("Measurement name"),
        when_from_name("name").alias("Measurement when"),
        classify_measurement(
            "name", F.col("has_iv"), F.col("has_1d"), F.col("has_1d_sweep")
        ).alias("Measurement type"),
        device_tokens("name").alias("Measured device(s)"),
    )
