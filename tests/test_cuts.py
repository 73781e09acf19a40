"""apply_cuts golden test — reproduces the reference docstring example
(reference: clean_beta_scan.py:27-40): two devices, lower/higher cuts,
AND-conjunction across devices, NaN rejects."""

import math

import pandas as pd

from etl_market_survey_spark.operators.cuts import (
    apply_cuts,
    attach_accepted,
    drop_incomplete_groups,
    validate_cuts,
)


def _data(spark):
    rows = []
    # triggers 0..4, devices A/B; amplitude & charge
    vals = {
        # trig: (A_amp, A_chg, B_amp, B_chg)
        0: (1.0, 10.0, 1.0, 10.0),   # passes all
        1: (0.1, 10.0, 1.0, 10.0),   # fails A amp lower cut
        2: (1.0, 99.0, 1.0, 10.0),   # fails A charge higher cut
        3: (1.0, 10.0, math.nan, 10.0),  # NaN -> reject
        4: (2.0, 10.0, 1.0, 10.0),   # passes
    }
    for t, (aa, ac, ba, bc) in vals.items():
        rows.append((t, "A", aa, ac))
        rows.append((t, "B", ba, bc))
    return spark.createDataFrame(
        rows, "n_trigger long, device_name string, amplitude double, charge double"
    )


def _cuts(spark):
    return spark.createDataFrame(
        [
            ("amplitude", "A", "lower", 0.5),
            ("amplitude", "B", "lower", 0.5),
            ("charge", "A", "higher", 50.0),
        ],
        "variable string, device_name string, `cut type` string, `cut value` double",
    )


def test_apply_cuts_golden(spark):
    out = (
        apply_cuts(_data(spark), _cuts(spark))
        .orderBy("n_trigger")
        .toPandas()
        .set_index("n_trigger")["accepted"]
    )
    assert out.to_dict() == {0: True, 1: False, 2: False, 3: False, 4: True}


def test_cuts_monotone_property(spark):
    # SURVEY §5.4: tightening a cut never accepts more triggers.
    data = _data(spark)
    loose = apply_cuts(data, _cuts(spark)).filter("accepted").count()
    tighter = spark.createDataFrame(
        [("amplitude", "A", "lower", 1.5), ("amplitude", "B", "lower", 0.5),
         ("charge", "A", "higher", 50.0)],
        "variable string, device_name string, `cut type` string, `cut value` double",
    )
    tight = apply_cuts(data, tighter).filter("accepted").count()
    assert tight <= loose


def test_validate_cuts_flags_unknown_device(spark):
    bad = spark.createDataFrame(
        [("amplitude", "NOPE", "lower", 0.5)],
        "variable string, device_name string, `cut type` string, `cut value` double",
    )
    assert validate_cuts(_data(spark), bad).count() == 1
    assert validate_cuts(_data(spark), _cuts(spark)).count() == 0


def test_attach_accepted_left_join(spark):
    data = _data(spark)
    accepted = apply_cuts(data, _cuts(spark))
    out = attach_accepted(data, accepted)
    assert out.count() == data.count()
    assert "accepted" in out.columns


def test_drop_incomplete_groups(spark):
    data = _data(spark)
    out = drop_incomplete_groups(
        data, value_cols=["amplitude", "charge"], n_devices=2
    )
    # trigger 3 has a NaN amplitude on device B -> whole trigger dropped
    kept = {r["n_trigger"] for r in out.select("n_trigger").distinct().collect()}
    assert kept == {0, 1, 2, 4}
