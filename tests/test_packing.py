"""Sequence-packing invariants: total coverage, no overlap, full
sequences, determinism, and capacity validation."""

import random

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.packing import pack_sequences


def _docs(spark, n=300, seed=5):
    rng = random.Random(seed)
    rows = [(i, rng.randint(0, 900)) for i in range(n)]  # includes zero-len
    return spark.createDataFrame(rows, "doc_id long, n_tok long"), rows


def test_every_token_covered_exactly_once(spark):
    df, rows = _docs(spark)
    out = pack_sequences(df, "doc_id", "n_tok", capacity=512).collect()
    # per doc: slices tile [0, n_tok) without gap or overlap
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    lens = dict(rows)
    for doc_id, segs in by_doc.items():
        segs = sorted(segs, key=lambda r: r.doc_lo)
        assert segs[0].doc_lo == 0
        assert segs[-1].doc_hi == lens[doc_id]
        for a, b in zip(segs, segs[1:]):
            assert a.doc_hi == b.doc_lo  # contiguous, no overlap
    # zero-length docs are absent
    assert all(lens[d] > 0 for d in by_doc)
    assert set(by_doc) == {d for d, n in rows if n > 0}


def test_sequences_full_except_last_per_shard(spark):
    df, _ = _docs(spark)
    out = pack_sequences(df, "doc_id", "n_tok", capacity=512).collect()
    fill = {}
    for r in out:
        key = (r.shard, r.seq_id)
        fill[key] = fill.get(key, 0) + (r.doc_hi - r.doc_lo)
    last = {s: max(q for sh, q in fill if sh == s) for s, _ in fill}
    for (shard, seq_id), tokens in fill.items():
        if seq_id < last[shard]:
            assert tokens == 512, (shard, seq_id, tokens)
        else:
            assert 0 < tokens <= 512
    # within a sequence, slices tile [0, fill) by seq_off
    segs = {}
    for r in out:
        segs.setdefault((r.shard, r.seq_id), []).append(r)
    for key, ss in segs.items():
        ss = sorted(ss, key=lambda r: r.seq_off)
        assert ss[0].seq_off == 0
        pos = 0
        for s in ss:
            assert s.seq_off == pos
            pos += s.doc_hi - s.doc_lo
        assert pos == fill[key]


def test_deterministic_under_repartition(spark):
    df, _ = _docs(spark, n=120, seed=9)
    a = sorted(map(tuple, pack_sequences(df, "doc_id", "n_tok", 256).collect()))
    b = sorted(
        map(tuple, pack_sequences(df.repartition(7), "doc_id", "n_tok", 256).collect())
    )
    assert a == b


def test_capacity_validation(spark):
    df, _ = _docs(spark, n=5)
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "n_tok", 0)


def test_doc_longer_than_capacity_spans_sequences(spark):
    df = spark.createDataFrame([(1, 1000)], "doc_id long, n_tok long")
    out = sorted(
        pack_sequences(df, "doc_id", "n_tok", 300, n_shards=1).collect(),
        key=lambda r: r.doc_lo,
    )
    assert [r.doc_hi - r.doc_lo for r in out] == [300, 300, 300, 100]
    assert [r.seq_off for r in out] == [0, 0, 0, 0]
    assert [r.seq_id for r in out] == [0, 1, 2, 3]


def test_chunk_spans_cover_with_overlap(spark):
    from etl_market_survey_spark.operators.packing import chunk_spans

    df = spark.createDataFrame(
        [(1, 1200), (2, 500), (3, 499), (4, 1), (5, 0)], "doc_id long, n long"
    )
    out = chunk_spans(df, "doc_id", "n", chunk=500, overlap=100).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.lo, r.hi))
    assert 5 not in by_doc  # zero-length dropped
    assert by_doc[4] == [(0, 0, 1)]
    assert by_doc[2] == [(0, 0, 500)]  # exact fit: one chunk
    assert by_doc[3] == [(0, 0, 499)]
    segs = sorted(by_doc[1])
    assert segs[0] == (0, 0, 500)
    for (i1, lo1, hi1), (i2, lo2, hi2) in zip(segs, segs[1:]):
        assert i2 == i1 + 1 and lo2 == lo1 + 400 and hi1 - lo2 == 100  # overlap
    assert segs[-1][2] == 1200  # covers to the end


def test_chunk_spans_validation(spark):
    from etl_market_survey_spark.operators.packing import chunk_spans

    df = spark.createDataFrame([(1, 10)], "doc_id long, n long")
    import pytest as _pt

    with _pt.raises(ValueError):
        chunk_spans(df, "doc_id", "n", chunk=100, overlap=100)


def test_nosplit_bins_respect_capacity_and_order(spark):
    from etl_market_survey_spark.operators.packing import pack_bins_nosplit

    import random

    rng = random.Random(3)
    rows = [(i, rng.randint(1, 700)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_bins_nosplit(df, "doc_id", "n_tok", capacity=1000).collect()
    lens = dict(rows)
    assert {r.doc_id for r in out} == set(lens)
    fill = {}
    for r in out:
        key = (r.shard, r.bin_id)
        fill[key] = fill.get(key, 0) + lens[r.doc_id]
        assert r.bin_used <= 1000 or lens[r.doc_id] > 1000
    for key, tot in fill.items():
        assert tot <= 1000  # no doc split, no overfill (all lens <= cap)
    # bin_used is the running fill: max bin_used per bin == total fill
    mx = {}
    for r in out:
        key = (r.shard, r.bin_id)
        mx[key] = max(mx.get(key, 0), r.bin_used)
    assert mx == fill


def test_nosplit_oversize_doc_gets_own_bin(spark):
    from etl_market_survey_spark.operators.packing import pack_bins_nosplit

    df = spark.createDataFrame(
        [(1, 50), (2, 5000), (3, 60)], "doc_id long, n_tok long"
    )
    out = pack_bins_nosplit(df, "doc_id", "n_tok", 100, n_shards=1).collect()
    big = [r for r in out if r.doc_id == 2][0]
    others = [r for r in out if r.doc_id != 2]
    assert all(
        (o.shard, o.bin_id) != (big.shard, big.bin_id) for o in others
    )


def test_nosplit_deterministic_under_repartition(spark):
    from etl_market_survey_spark.operators.packing import pack_bins_nosplit

    import random

    rng = random.Random(8)
    rows = [(i, rng.randint(1, 300)) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    a = sorted(map(tuple, pack_bins_nosplit(df, "doc_id", "n_tok", 512).collect()))
    b = sorted(
        map(
            tuple,
            pack_bins_nosplit(df.repartition(11), "doc_id", "n_tok", 512).collect(),
        )
    )
    assert a == b
