"""WARC source (sources/warc.py): streaming parse, multi-member gzip,
distributed export roundtrip."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from adfs_spark.sources.warc import (
    _inflate_stream,
    _parse_records,
    http_payload,
    read_warc,
    write_warc,
)


def _record(uri: str, body: bytes, wtype: str = "response", ctype: str = "text/plain") -> bytes:
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: <urn:test:{uri}>\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def test_inflate_multimember():
    members = [gzip.compress(f"rec{i}".encode() * 100) for i in range(5)]
    got = b"".join(_inflate_stream(b"".join(members), chunk=37))
    assert got == b"".join(f"rec{i}".encode() * 100 for i in range(5))


def test_parse_records_streaming_chunks():
    raw = b"".join(
        _record(f"http://x/{i}", f"body-{i}".encode() * (i + 1)) for i in range(4)
    )
    # feed in adversarially tiny chunks so every boundary splits
    chunks = [raw[i : i + 7] for i in range(0, len(raw), 7)]
    recs = list(_parse_records(iter(chunks), None))
    assert [r["target_uri"] for r in recs] == [f"http://x/{i}" for i in range(4)]
    assert recs[2]["payload"] == b"body-2" * 3
    assert all(r["content_length"] == len(r["payload"]) for r in recs)


def test_parse_records_max_payload_truncates():
    raw = _record("http://x/a", b"z" * 1000)
    (rec,) = _parse_records(iter([raw]), 16)
    assert rec["payload"] == b"z" * 16 and rec["content_length"] == 1000


def test_read_warc_plain_and_gz(spark, tmp_path):
    recs = [_record(f"http://d/{i}", f"text {i}".encode()) for i in range(6)]
    skip = _record("http://d/meta", b"{}", wtype="warcinfo")
    plain = tmp_path / "a.warc"
    plain.write_bytes(skip + b"".join(recs[:3]))
    gz = tmp_path / "b.warc.gz"
    gz.write_bytes(b"".join(gzip.compress(r) for r in recs[3:]))
    df = read_warc(spark, str(tmp_path))
    rows = {r["target_uri"]: r for r in df.collect()}
    assert set(rows) == {f"http://d/{i}" for i in range(6)}  # warcinfo filtered
    assert bytes(rows["http://d/4"]["payload"]) == b"text 4"
    assert rows["http://d/1"]["warc_type"] == "response"
    assert rows["http://d/5"]["file"].endswith("b.warc.gz")


def test_http_payload_strips_headers(spark):
    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hi</html>"
    df = spark.createDataFrame([(body,), (b"no headers here",)], "payload: binary")
    got = [r["t"] for r in df.select(http_payload(F.col("payload")).alias("t")).collect()]
    assert got == ["<html>hi</html>", "no headers here"]


def test_write_read_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [(f"https://r/{i}", f"payload number {i}") for i in range(50)],
        "uri: string, text: string",
    ).repartition(4)
    out = os.path.join(str(tmp_path), "dump")
    summary = write_warc(src, out, uri_col="uri", payload_col="text")
    files = sorted(f for f in os.listdir(out) if f.endswith(".warc.gz"))
    assert 1 <= len(files) <= 4
    assert summary.agg(F.sum("n_records")).first()[0] == 50
    back = read_warc(spark, out)
    got = {
        r["target_uri"]: bytes(r["payload"]).decode() for r in back.collect()
    }
    assert got == {f"https://r/{i}": f"payload number {i}" for i in range(50)}
    # resource records, one gzip member each => member count == record count
    import zlib as _z

    blob = open(os.path.join(out, files[0]), "rb").read()
    members = 0
    d = _z.decompressobj(16 + _z.MAX_WBITS)
    data = blob
    while data:
        d.decompress(data)
        assert d.eof
        members += 1
        data = d.unused_data
        d = _z.decompressobj(16 + _z.MAX_WBITS)
    assert members == sum(
        1 for r in back.collect() if r["file"].endswith(files[0])
    )

def test_parse_records_oversize_body_streams_past():
    # an oversize record's body beyond the cap is discarded while
    # streaming; following records still parse, and the capped payload
    # is intact even when the body spans many chunks
    big = _record("http://x/big", b"B" * 50_000)
    after = _record("http://x/next", b"small")
    raw = big + after
    chunks = [raw[i : i + 512] for i in range(0, len(raw), 512)]
    recs = list(_parse_records(iter(chunks), 64))
    assert [r["target_uri"] for r in recs] == ["http://x/big", "http://x/next"]
    assert recs[0]["payload"] == b"B" * 64
    assert recs[0]["content_length"] == 50_000
    assert recs[1]["payload"] == b"small"


def test_parse_records_truncated_archive_emits_capped_record():
    # archive cut off mid-body: the capped payload was already complete,
    # so the record is still emitted at end-of-stream
    raw = _record("http://x/cut", b"C" * 10_000)[:600]
    (rec,) = _parse_records(iter([raw]), 32)
    assert rec["payload"] == b"C" * 32 and rec["content_length"] == 10_000


def test_write_warc_plain_roundtrip(spark, tmp_path):
    # gzip_members=False names files .warc, and read_warc re-reads them
    src = spark.createDataFrame(
        [(f"https://p/{i}", f"plain {i}") for i in range(10)],
        "uri: string, text: string",
    ).repartition(2)
    out = os.path.join(str(tmp_path), "plaindump")
    summary = write_warc(
        src, out, uri_col="uri", payload_col="text", gzip_members=False
    )
    files = os.listdir(out)
    assert files and all(f.endswith(".warc") for f in files)
    assert not any(f.endswith(".tmp") for f in files)  # task-commit renamed
    assert summary.agg(F.sum("n_records")).first()[0] == 10
    back = read_warc(spark, out)
    got = {r["target_uri"]: bytes(r["payload"]).decode() for r in back.collect()}
    assert got == {f"https://p/{i}": f"plain {i}" for i in range(10)}
