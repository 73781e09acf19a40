"""Waveform feature extraction against an analytic ramp: a waveform with
a known linear rising edge has closed-form CFD crossing times."""

import numpy as np
import pandas as pd
import pytest

from etl_market_survey_spark.operators.waveform import waveform_features


def _ramp_waveform():
    # flat baseline 0 V on t in [0, 1); linear ramp 0->1 V on [1, 2);
    # flat top 1 V on [2, 3]. t_k = 1 + k/100 exactly.
    t = np.linspace(0.0, 3.0, 301)
    a = np.clip(t - 1.0, 0.0, 1.0)
    return t, a


def test_waveform_features_analytic(spark):
    t, a = _ramp_waveform()
    rows = [(0, "A", float(tt), float(aa)) for tt, aa in zip(t, a)]
    df = spark.createDataFrame(
        rows, "n_trigger long, device_name string, `Time (s)` double, `Amplitude (V)` double"
    )
    out = waveform_features(df, baseline_end=0.9).collect()[0]
    assert out["Baseline (V)"] == pytest.approx(0.0, abs=1e-12)
    assert out["Noise (V)"] == pytest.approx(0.0, abs=1e-12)
    assert out["Amplitude (V)"] == pytest.approx(1.0, abs=1e-12)
    for k in range(10, 100, 10):
        assert out[f"t_{k} (s)"] == pytest.approx(1.0 + k / 100.0, abs=1e-9), k
    assert out["Rise time (s)"] == pytest.approx(0.8, abs=1e-9)
    # charge = integral of (a - baseline) dt = area of ramp (0.5) + top (1.0)
    assert out["Collected charge (V s)"] == pytest.approx(1.5, rel=0.02)


def test_waveform_features_two_devices(spark):
    t, a = _ramp_waveform()
    rows = [(0, d, float(tt), float(aa * s)) for d, s in [("A", 1.0), ("B", 2.0)]
            for tt, aa in zip(t, a)]
    df = spark.createDataFrame(
        rows, "n_trigger long, device_name string, `Time (s)` double, `Amplitude (V)` double"
    )
    out = {r["device_name"]: r for r in waveform_features(df, baseline_end=0.9).collect()}
    assert out["B"]["Amplitude (V)"] == pytest.approx(2.0, abs=1e-12)
    # CFD times are amplitude-invariant (constant-fraction!)
    assert out["A"]["t_50 (s)"] == pytest.approx(out["B"]["t_50 (s)"], abs=1e-9)
