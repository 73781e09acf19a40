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


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    xs=st.lists(
        st.floats(min_value=-6.0, max_value=6.0, allow_nan=False, width=64),
        min_size=1,
        max_size=30,
    )
)
def test_erf_expr_within_published_error(sess, xs):
    """The shared A&S 7.1.26 erf expression stays within its published
    1.5e-7 bound of the true erf on arbitrary inputs (both engines run
    the identical expression; correctness vs math.erf checked here)."""
    from etl_market_survey_spark.functions.mathx import erf_expr

    df = sess.createDataFrame([(float(x),) for x in xs], "x double")
    got = [r[0] for r in df.select(erf_expr("x")).collect()]
    for x, g in zip(xs, got):
        assert abs(g - math.erf(x)) < 2e-7  # 1.5e-7 approx + 5e-10 round


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lens=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=40),
    cap=st.integers(min_value=1, max_value=700),
)
def test_pack_sequences_token_conservation(sess, lens, cap):
    """Every input token lands in exactly one (shard, seq, slot)."""
    from etl_market_survey_spark.operators.packing import pack_sequences

    df = sess.createDataFrame(list(enumerate(lens)), "doc_id long, n long")
    out = pack_sequences(df, "doc_id", "n", cap).collect()
    placed = sum(r.doc_hi - r.doc_lo for r in out)
    assert placed == sum(lens)
    # and no slice exceeds capacity or its document
    for r in out:
        assert 0 < r.doc_hi - r.doc_lo <= min(cap, lens[r.doc_id])
        assert 0 <= r.seq_off < cap


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lens=st.lists(st.integers(min_value=0, max_value=3000), min_size=1, max_size=30),
    chunk=st.integers(min_value=2, max_value=800),
    data=st.data(),
)
def test_chunk_spans_tile_property(sess, lens, chunk, data):
    from etl_market_survey_spark.operators.packing import chunk_spans

    overlap = data.draw(st.integers(min_value=0, max_value=chunk - 1))
    df = sess.createDataFrame(list(enumerate(lens)), "doc_id long, n long")
    out = chunk_spans(df, "doc_id", "n", chunk, overlap).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.lo, r.hi))
    stride = chunk - overlap
    for i, n in enumerate(lens):
        if n == 0:
            assert i not in by_doc
            continue
        spans = sorted(by_doc[i])
        assert spans[0][0] == 0 and spans[-1][1] == n
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            # stride spacing; contiguous when overlap=0, overlapping else
            assert lo2 == lo1 + stride and lo2 <= hi1
            if overlap and hi1 < n:
                assert hi1 - lo2 == overlap


# ---------------------------------------------------------------------------
# Avro codec round-trip (sources/avro) — pure Python, no Spark needed:
# arbitrary values through every primitive + nullable-union + array/map
# shape must decode bit-identically under both codecs.
# ---------------------------------------------------------------------------

_AVRO_SCHEMA = {
    "type": "record", "name": "fuzz", "fields": [
        {"name": "l", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "bytes"},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
    ],
}

_avro_records = st.lists(
    st.fixed_dictionaries(
        {
            "l": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "s": st.one_of(st.none(), st.text(max_size=40)),
            "d": st.floats(allow_nan=False, width=64),
            "b": st.binary(max_size=32),
            "arr": st.lists(
                st.integers(min_value=-(2**40), max_value=2**40), max_size=8
            ),
            "m": st.dictionaries(st.text(min_size=1, max_size=8),
                                 st.integers(min_value=0, max_value=2**32),
                                 max_size=5),
        }
    ),
    max_size=20,
)


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(recs=_avro_records)
@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_container_round_trip_fuzz(recs, codec):
    from etl_market_survey_spark.sources.avro import (
        decode_container,
        encode_container,
    )

    schema, back = decode_container(encode_container(_AVRO_SCHEMA, recs, codec))
    assert schema == _AVRO_SCHEMA
    assert back == recs
