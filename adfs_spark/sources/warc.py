"""WARC (ISO 28500) ingestion and export — the Common Crawl format.

The 100 TB training-data corpus arrives as WARC: ~1 GB ``.warc.gz``
files, each a concatenation of per-record gzip members.  The Spark
shape here mirrors how that corpus is actually processed:

- **read**: ``spark.read.format("binaryFile")`` gives one row per
  archive (path + bytes), so parallelism = number of archives — at
  Common Crawl scale, ~100k independent ~1 GB tasks with NO shuffle.
  Record splitting is a streaming parser inside ``mapInPandas`` (an
  Arrow-batched, documented python boundary — the format is a
  byte-stream protocol, not relational): gzip members are inflated
  incrementally through ``zlib.decompressobj`` and complete records
  are emitted as soon as their ``Content-Length`` worth of bytes is
  buffered, so peak memory is O(largest record), not O(archive).
- **write**: one ``.warc.gz`` per partition via ``mapInPandas``
  returning a tiny (file, n_records) summary frame — the standard
  side-file pattern (the same staging idiom as the blocked k-NN
  tier); on a cluster the directory lives on shared storage.

Records with ``Content-Type: application/http`` carry an HTTP
response; :func:`http_payload` strips the status line + headers
(split at the first CRLFCRLF), which is how WET extraction starts.
"""

from __future__ import annotations

import io
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("record_id", StringType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", BinaryType()),
    ]
)

_CRLF2 = b"\r\n\r\n"


def _inflate_stream(data: bytes, chunk: int = 1 << 20) -> Iterator[bytes]:
    """Yield decompressed chunks from a (possibly multi-member) gzip
    byte string — Common Crawl archives are one gzip member per
    record, so the loop restarts a decompressobj on ``unused_data``."""
    pos = 0
    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    while pos < len(data):
        out = d.decompress(data[pos : pos + chunk])
        pos = min(pos + chunk, len(data))
        if out:
            yield out
        # a member may end mid-chunk (and the remainder may hold more
        # complete small members): restart on unused_data until the
        # current feed is fully consumed
        while d.eof:
            rest = d.unused_data
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            if not rest:
                break
            out = d.decompress(rest)
            if out:
                yield out


def _parse_records(
    chunks: Iterator[bytes], max_payload: int | None
) -> Iterator[dict]:
    """Streaming WARC record parser over decompressed chunks: buffers
    only until the current record's payload (capped at ``max_payload``
    when set) is available, then emits.  Body bytes beyond the cap are
    DISCARDED as they stream past — never accumulated — so with a cap
    set, peak memory is O(max_payload), not O(declared Content-Length);
    a pathological multi-GB record costs inflate time only.  Without a
    cap, a record whose body exceeds 2 GiB raises (Python ``bytes``
    buffering is the wrong tool past that point; set a cap)."""
    buf = b""
    skip = 0  # body bytes of the current (capped) record still to discard
    pending: dict | None = None  # record awaiting emit once skip drains
    for piece in chunks:
        if skip:
            if len(piece) < skip:
                skip -= len(piece)
                continue
            piece = piece[skip:]
            skip = 0
            if pending is not None:
                yield pending
                pending = None
        buf += piece
        while True:
            start = buf.find(b"WARC/")
            if start < 0:
                buf = buf[-8:]  # keep a potential split "WARC/" prefix
                break
            head_end = buf.find(_CRLF2, start)
            if head_end < 0:
                buf = buf[start:]
                break
            headers: dict[str, str] = {}
            lines = buf[start:head_end].decode("utf-8", "replace").split("\r\n")
            for line in lines[1:]:
                k, _, v = line.partition(":")
                if _:
                    headers[k.strip().lower()] = v.strip()
            try:
                clen = int(headers.get("content-length", ""))
            except ValueError:
                buf = buf[head_end + 4 :]
                continue
            body_start = head_end + 4
            keep = clen if max_payload is None else min(clen, max_payload)
            if len(buf) < body_start + keep:
                if len(buf) - start > (1 << 31):
                    raise ValueError(
                        "WARC record exceeds 2 GiB; set max_payload_bytes"
                    )
                buf = buf[start:]
                break
            rec = {
                "record_id": headers.get("warc-record-id"),
                "warc_type": headers.get("warc-type"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_type": headers.get("content-type"),
                "content_length": clen,
                "payload": buf[body_start : body_start + keep],
            }
            tail = body_start + clen
            if len(buf) >= tail:
                yield rec
                buf = buf[tail:]
            else:
                # oversize body: stream the remainder past without buffering
                skip = tail - len(buf)
                pending = rec
                buf = b""
                break
    if pending is not None:
        yield pending  # truncated archive: payload up to the cap is intact


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] | None = ("response", "resource", "conversion"),
    max_payload_bytes: int | None = None,
    batch_rows: int = 256,
) -> DataFrame:
    """One row per WARC record under ``path`` (``*.warc`` plain or
    ``*.warc.gz`` member-per-record).  Parallelism = archive count;
    zero shuffles.  ``record_types`` pre-filters inside the parser
    (warcinfo/request/metadata records never reach Spark rows);
    ``max_payload_bytes`` truncates payloads at the source: bytes past
    the cap are discarded while streaming (never buffered), so at
    100 TB the cap really is what keeps a pathological multi-GB record
    from owning an executor's memory."""
    import pandas as pd

    types = set(record_types) if record_types is not None else None

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                raw: bytes = row["content"]
                name: str = row["path"]
                chunks = (
                    _inflate_stream(raw)
                    if name.endswith(".gz")
                    else iter([raw])
                )
                out: list[dict] = []
                for rec in _parse_records(chunks, max_payload_bytes):
                    if types is not None and rec["warc_type"] not in types:
                        continue
                    rec["file"] = name
                    out.append(rec)
                    if len(out) >= batch_rows:
                        yield pd.DataFrame(out, columns=WARC_SCHEMA.names)
                        out = []
                if out:
                    yield pd.DataFrame(out, columns=WARC_SCHEMA.names)

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )
    return binary.mapInPandas(parse, WARC_SCHEMA)


def http_payload(payload):
    """The body of an ``application/http`` response payload: text
    after the first CRLFCRLF (status line + headers stripped) — the
    first step of WET extraction.  Pure JVM expression; payloads with
    no header block pass through unchanged."""
    s = payload.cast("string")
    return F.when(
        F.instr(s, "\r\n\r\n") > 0,
        F.regexp_replace(s, r"(?s)^.*?\r\n\r\n", ""),
    ).otherwise(s)


def write_warc(
    df: DataFrame,
    out_dir: str,
    uri_col: str = "uri",
    payload_col: str = "payload",
    record_type: str = "resource",
    content_type: str = "text/plain",
    gzip_members: bool = True,
) -> DataFrame:
    """Export (uri, payload) rows as WARC: one archive per partition
    (``.warc.gz`` with each record its own gzip member — the Common
    Crawl layout, so downstream readers can split records without
    inflating the archive — or plain ``.warc`` when
    ``gzip_members=False``; the extension tells :func:`read_warc`
    which decoder to use).  Runs as a distributed action and returns
    the (file, n_records) summary frame.  ``out_dir`` must be shared
    storage on a cluster (side-file pattern); each task writes an
    attempt-scoped temp file and renames on success."""
    import gzip
    import hashlib
    import os

    import pandas as pd
    from pyspark import TaskContext

    os.makedirs(out_dir, exist_ok=True)
    src = df.select(
        F.col(uri_col).cast("string").alias("uri"),
        F.col(payload_col).cast("binary").alias("payload"),
    )

    out_schema = StructType(
        [StructField("file", StringType()), StructField("n_records", LongType())]
    )

    ext = ".warc.gz" if gzip_members else ".warc"

    def dump(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        ctx = TaskContext.get()
        fname = os.path.join(out_dir, f"part-{ctx.partitionId():05d}{ext}")
        # task-commit: write to an attempt-scoped temp and rename on
        # success, so a retried or speculative duplicate task never
        # exposes a partial file — last completed attempt wins whole.
        tmp = f"{fname}.{ctx.taskAttemptId()}.tmp"
        n = 0
        with open(tmp, "wb") as fh:
            for pdf in batches:
                for _, row in pdf.iterrows():
                    body = bytes(row["payload"] or b"")
                    rid = hashlib.md5(
                        (row["uri"] or "").encode() + body
                    ).hexdigest()
                    head = (
                        "WARC/1.0\r\n"
                        f"WARC-Type: {record_type}\r\n"
                        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
                        "WARC-Date: 1970-01-01T00:00:00Z\r\n"
                        f"WARC-Target-URI: {row['uri']}\r\n"
                        f"Content-Type: {content_type}\r\n"
                        f"Content-Length: {len(body)}\r\n\r\n"
                    ).encode()
                    record = head + body + b"\r\n\r\n"
                    fh.write(gzip.compress(record) if gzip_members else record)
                    n += 1
        if n == 0:
            os.unlink(tmp)
            yield pd.DataFrame(columns=out_schema.names)
        else:
            os.replace(tmp, fname)
            yield pd.DataFrame([{"file": fname, "n_records": n}])

    summary = src.mapInPandas(dump, out_schema)
    # materialize (the write IS the action); the summary is partition-count-sized
    rows = summary.collect()
    spark = df.sparkSession
    return spark.createDataFrame(rows, out_schema) if rows else spark.createDataFrame([], out_schema)
