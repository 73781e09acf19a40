"""Property-based tests (SURVEY §5.4) with hypothesis: the stats kernel
against numpy on arbitrary float arrays, cut monotonicity, union-order
invariance of group aggregates."""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_market_survey_spark.functions.stats import K_MAD_TO_STD, group_mad, group_median

_floats = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
    min_size=1,
    max_size=60,
)


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=_floats)
def test_median_mad_match_numpy(sess, vals):
    pdf = pd.DataFrame({"g": ["a"] * len(vals), "x": vals})
    df = sess.createDataFrame(pdf)
    med = group_median(df, ["g"], "x", "m").collect()[0]["m"]
    assert med == pytest.approx(float(np.median(vals)), rel=1e-12, abs=1e-12)
    mad = group_mad(df, ["g"], "x", "mad", scaled=False).collect()[0]["mad"]
    assert mad == pytest.approx(float(np.median(np.abs(np.array(vals) - np.median(vals)))), rel=1e-12, abs=1e-12)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=0, max_value=100, allow_nan=False), min_size=4, max_size=40
    ),
    cut1=st.floats(min_value=0, max_value=100, allow_nan=False),
    delta=st.floats(min_value=0, max_value=50, allow_nan=False),
)
def test_cut_tightening_is_monotone(sess, vals, cut1, delta):
    from etl_market_survey_spark.operators.cuts import apply_cuts

    rows = [(i, "d", v) for i, v in enumerate(vals)]
    data = sess.createDataFrame(rows, "n_trigger long, device_name string, x double")

    def accepted_count(cut):
        cuts = sess.createDataFrame(
            [("x", "d", "lower", float(cut))],
            "variable string, device_name string, `cut type` string, `cut value` double",
        )
        return apply_cuts(data, cuts).filter("accepted").count()

    assert accepted_count(cut1 + delta) <= accepted_count(cut1)
