"""WARC (Web ARChive, ISO 28500) reader/writer — the corpus container
web-scale curation pipelines actually ingest (Common Crawl ships WARC).

Library-free: a WARC file is a sequence of records, each
``WARC/1.0\\r\\n`` + header lines + ``\\r\\n`` + Content-Length payload
bytes + ``\\r\\n\\r\\n``; the standard allows per-record gzip members
concatenated into one ``.warc.gz`` (stdlib gzip handles concatenated
members natively). Both layouts are supported.

Scale shape: WARC's unit of parallelism is the FILE (records are not
seekable without an index), so the reader distributes whole files via
Spark's binaryFile source and parses records in an Arrow-batched
kernel — exactly how Common Crawl jobs shard (one task per warc part
file, ~1 GB each by convention). Header parse is bytes-only and
deterministic; payloads stay ``binary`` and ride the multimodal
column contract (attach_metadata/digest prune before any decode).

The writer exists to make round-trip gates and fixtures possible
(production pipelines read WARC, they rarely write it).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"


def build_warc(records: list[dict], compress: bool = False) -> bytes:
    """Serialize records (dicts with ``warc_type``, ``target_uri``,
    ``warc_date``, ``payload`` bytes, optional ``content_type``) into
    WARC bytes — per-record gzip members when ``compress``."""
    out = io.BytesIO()
    for r in records:
        payload = r["payload"]
        head = [
            b"WARC/1.0",
            b"WARC-Type: " + r.get("warc_type", "response").encode(),
            b"WARC-Target-URI: " + r.get("target_uri", "").encode(),
            b"WARC-Date: " + r.get("warc_date", "").encode(),
            b"Content-Type: " + r.get("content_type", "application/octet-stream").encode(),
            b"Content-Length: " + str(len(payload)).encode(),
        ]
        rec = _CRLF.join(head) + _CRLF + _CRLF + payload + _CRLF + _CRLF
        if compress:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            out.write(buf.getvalue())
        else:
            out.write(rec)
    return out.getvalue()


def parse_warc(data: bytes) -> list[dict]:
    """Parse WARC bytes (plain or concatenated-gzip) into records:
    ``{warc_type, target_uri, warc_date, content_type, payload}``.
    Unknown headers are ignored; malformed trailing bytes raise."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # stdlib handles concatenated members
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record blank lines
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC version line at byte {pos}")
        head_end = data.index(_CRLF + _CRLF, pos)
        headers: dict[str, str] = {}
        for line in data[pos:head_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        body_start = head_end + 4
        payload = data[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError("truncated WARC payload")
        records.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "target_uri": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "content_type": headers.get("content-type", ""),
                "payload": payload,
            }
        )
        pos = body_start + length
    return records


WARC_SCHEMA = (
    "warc_file string, record_idx int, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "payload binary, n_bytes long"
)


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed WARC scan: one task per file (binaryFile source),
    records parsed in an Arrow kernel. Columns: ``warc_file,
    record_idx, warc_type, target_uri, warc_date, content_type,
    payload, n_bytes``."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for i, r in enumerate(parse_warc(bytes(content))):
                    rows.append(
                        {
                            "warc_file": fpath,
                            "record_idx": i,
                            "warc_type": r["warc_type"],
                            "target_uri": r["target_uri"],
                            "warc_date": r["warc_date"],
                            "content_type": r["content_type"],
                            "payload": r["payload"],
                            "n_bytes": len(r["payload"]),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "record_idx", "warc_type", "target_uri",
                    "warc_date", "content_type", "payload", "n_bytes",
                ],
            )

    return files.select("path", "content").mapInPandas(kernel, WARC_SCHEMA)
