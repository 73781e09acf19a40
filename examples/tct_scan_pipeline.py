"""Worked example — the reference's TCT 1D-scan workflow end-to-end on
FIXTURES.md §3-shaped data (verbatim column names and geometry constants:
window 300 µm, inter-pixel distance 100 µm, laser σ 9 µm).

  1. pad tagging: which channel is 'left'/'right'            (A11)
  2. group-wise normalization to the metal/silicon medians    (A12)
  3. erf fit per pad -> laser sigma + pad edge               (U3)
  4. inverse interpolation at 50% threshold -> edge crossings (U4)
  5. inter-pixel distance = right edge - left edge, vs the
     known geometry; distance calibration factor             (U5)

Run: python examples/tct_scan_pipeline.py [output_dir]
"""

from __future__ import annotations

import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from etl_market_survey_spark.fits.grouped import fit_erf_per_group
from etl_market_survey_spark.operators.interpolate import crossing_x
from etl_market_survey_spark.operators.tct import normalize_collected_charge, tag_pads
from etl_market_survey_spark.sources.writers import write_text_sidecar

WINDOW = 300e-6
IPD = 100e-6
LASER_SIGMA = 9e-6
N_POS = 220


def synthesize_scan(spark, seed: int = 42):
    """Two pads: left pad signal falls off at +IPD/2 - ... the left pixel
    edge sits at -IPD/2, the right pixel edge at +IPD/2 (centered scan).
    Channel 0 reads the left pixel (signal where x < -IPD/2 is silicon...
    actually: silicon *outside* the gap, metal in the inter-pixel gap)."""
    from math import erf, sqrt

    rng = np.random.default_rng(seed)
    xs = np.linspace(-WINDOW / 2, WINDOW / 2, N_POS)
    rows = []
    for n_pos, x in enumerate(xs):
        for ch, sign, edge in [(0, -1.0, -IPD / 2), (1, 1.0, IPD / 2)]:
            # ch0 (left pad): full signal left of -IPD/2, falls to 0 across
            # the edge; ch1 mirrored.
            z = sign * (x - edge) / (LASER_SIGMA * sqrt(2.0))
            mean = 0.5 * (1.0 + erf(z))
            for n_trig in range(4):
                q = 20e-12 * mean + rng.normal(0, 0.3e-12)
                rows.append((n_pos, ch, 1, n_trig, float(x), float(q)))
    return spark.createDataFrame(
        rows,
        "n_position long, n_channel long, n_pulse long, n_trigger long, "
        "`Distance (m)` double, `Collected charge (V s)` double",
    )


def main(out_dir: str):
    from etl_market_survey_spark.session import get_spark

    spark = get_spark("tct-scan-example")
    spark.sparkContext.setLogLevel("ERROR")

    scan = synthesize_scan(spark)

    # A11 — pad tagging: higher left-half charge => 'left'
    pads = tag_pads(
        scan, channel_col="n_channel", position_col="Distance (m)",
        charge_col="Collected charge (V s)",
    )
    tagged = scan.join(F.broadcast(pads), "n_channel").withColumnRenamed("Pad", "Pad")

    # A12 — normalize: metal = inter-pixel gap center; silicon = the far
    # plateau ON THE PAD'S OWN SIDE (per-pad regions, utils.py:100-111 —
    # the opposite side of the scan is the *other* pad's silicon).
    x = F.col("Distance (m)")
    thr = IPD / 2 + 3 * LASER_SIGMA
    silicon = ((F.col("Pad") == "left") & (x < -thr)) | (
        (F.col("Pad") == "right") & (x > thr)
    )
    norm = normalize_collected_charge(
        tagged,
        group_keys=["Pad", "n_pulse"],
        value_col="Collected charge (V s)",
        metal_cond=F.abs(x) < IPD / 2 - 2 * LASER_SIGMA,
        silicon_cond=silicon,
    )

    # U3 — erf fit per pad (left pad falls, right pad rises)
    fits = {}
    for pad, sign in [("left", -1.0), ("right", 1.0)]:
        out = fit_erf_per_group(
            norm.filter(F.col("Pad") == pad),
            ["Pad"],
            x_col="Distance (m)",
            y_col="Normalized collected charge",
            sign=sign,
        ).collect()[0]
        fits[pad] = out

    # U4 — 50% crossings from the averaged normalized curve per pad
    curve = norm.groupBy("Pad", "Distance (m)").agg(
        F.avg("Normalized collected charge").alias("y")
    )
    # left pad falls: use rising curve of (1 - y) for bracketing
    left_cross = crossing_x(
        curve.filter("Pad = 'left'").withColumn("y", 1.0 - F.col("y")),
        ["Pad"], "Distance (m)", "y", 0.5,
    ).collect()[0]["x_at_threshold"]
    right_cross = crossing_x(
        curve.filter("Pad = 'right'"), ["Pad"], "Distance (m)", "y", 0.5
    ).collect()[0]["x_at_threshold"]

    ipd_measured = right_cross - left_cross
    scale_factor = IPD / ipd_measured  # U5 calibration factor

    write_text_sidecar(
        {
            "inter-pixel distance (m)": ipd_measured,
            "multiply_distance_by_this_scale_factor_to_fix_calibration": scale_factor,
            "laser sigma left (m)": fits["left"]["laser_sigma"],
            "laser sigma right (m)": fits["right"]["laser_sigma"],
        },
        f"{out_dir}/tct_results.txt",
    )
    print(f"pad edges: left {left_cross * 1e6:.2f} um, right {right_cross * 1e6:.2f} um")
    print(f"inter-pixel distance: {ipd_measured * 1e6:.2f} um (true {IPD * 1e6:.0f} um)")
    print(
        f"laser sigma: {fits['left']['laser_sigma'] * 1e6:.2f} / "
        f"{fits['right']['laser_sigma'] * 1e6:.2f} um (true {LASER_SIGMA * 1e6:.0f} um)"
    )
    return ipd_measured, fits["left"]["laser_sigma"], fits["right"]["laser_sigma"]


if __name__ == "__main__":
    import os

    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tct_scan_example"
    os.makedirs(d, exist_ok=True)
    main(d)
