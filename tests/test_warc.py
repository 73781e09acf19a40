"""WARC reader/writer (sources/warc) — q267 gates the corpus path;
units pin the byte-level protocol: CRLF framing, Content-Length
slicing, concatenated gzip members, binary payload safety, malformed
input rejection."""

import gzip

import pytest

from etl_market_survey_spark.sources.warc import build_warc, parse_warc


def _recs():
    return [
        {
            "warc_type": "response",
            "target_uri": "http://a/1",
            "warc_date": "2024-01-01T00:00:00Z",
            "content_type": "text/plain",
            "payload": b"hello world",
        },
        {
            "warc_type": "request",
            "target_uri": "http://a/2",
            "warc_date": "2024-01-02T00:00:00Z",
            "content_type": "application/octet-stream",
            # binary payload containing CRLFs and fake headers — the
            # parser must slice by Content-Length, never by delimiters
            "payload": b"\r\n\r\nWARC/1.0\r\nContent-Length: 99\r\n\x00\xff",
        },
    ]


def test_roundtrip_plain():
    got = parse_warc(build_warc(_recs()))
    assert [r["target_uri"] for r in got] == ["http://a/1", "http://a/2"]
    assert got[0]["payload"] == b"hello world"
    assert got[1]["payload"] == _recs()[1]["payload"]
    assert got[1]["warc_type"] == "request"


def test_roundtrip_gzip_members():
    data = build_warc(_recs(), compress=True)
    assert data[:2] == b"\x1f\x8b"
    # two independent members: decompressing only the first yields one record
    got = parse_warc(data)
    assert len(got) == 2
    assert got[1]["payload"] == _recs()[1]["payload"]


def test_mixed_case_headers_and_unknown_headers():
    raw = (
        b"WARC/1.0\r\n"
        b"warc-type: response\r\n"
        b"WARC-TARGET-URI: http://x\r\n"
        b"X-Custom: ignored\r\n"
        b"content-length: 3\r\n"
        b"\r\nabc\r\n\r\n"
    )
    got = parse_warc(raw)
    assert got == [
        {
            "warc_type": "response",
            "target_uri": "http://x",
            "warc_date": "",
            "content_type": "",
            "payload": b"abc",
        }
    ]


def test_malformed_inputs_raise():
    with pytest.raises(ValueError):
        parse_warc(b"NOTWARC/1.0\r\n\r\n")
    truncated = build_warc(_recs())[:-10]
    with pytest.raises(ValueError):
        parse_warc(truncated)


def test_read_warc_distributed(spark, tmp_path):
    from etl_market_survey_spark.sources.warc import read_warc

    (tmp_path / "a.warc").write_bytes(build_warc(_recs()))
    (tmp_path / "b.warc.gz").write_bytes(build_warc(_recs(), compress=True))
    df = read_warc(spark, f"{tmp_path}/*")
    rows = df.collect()
    assert len(rows) == 4
    assert {r["record_idx"] for r in rows} == {0, 1}
    binary = [r for r in rows if r["warc_type"] == "request"]
    assert all(bytes(r["payload"]) == _recs()[1]["payload"] for r in binary)
    assert all(r["n_bytes"] == len(_recs()[1]["payload"]) for r in binary)
