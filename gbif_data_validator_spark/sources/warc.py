"""WARC source: raw Common-Crawl-style web archives (.warc / .warc.gz)
parsed straight into the engine's pages layout ``(url, warc_ts, html)``.

The reference ingests uploads/URLs of tabular archives
(source/DataFileFactory.java); the north-star pipeline's native wire
format upstream of the Iceberg table is WARC — this closes the gap
between "a crawl produced archives" and "the validation engine wants a
table", with no external libs (ISO 28500 framing is line-oriented;
Common-Crawl gzip is member-per-record, which stdlib zlib walks).

Scale shape: identical to the spreadsheet source — ``binaryFile`` is
file-granular, so 10k WARC shards parse in parallel, one file per task,
each record streaming out of ``mapInPandas`` as an Arrow batch; a corrupt
archive is ONE error row (a finding, never a crash). Common Crawl shards
are ~1 GB gzip — set ``spark.sql.files.maxPartitionBytes`` accordingly;
records never buffer more than one at a time beyond the payload cap.

Guards: per-record payload cap (decompression bomb), header-count cap,
total-record cap per file.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: per-record payload cap — one hostile Content-Length must not OOM a task
MAX_RECORD_BYTES = 64 * 1024 * 1024
#: header lines per record (real records carry ~10)
MAX_HEADER_LINES = 200
#: records per file (backstop against a crafted infinite member stream)
MAX_RECORDS_PER_FILE = 5_000_000


def _gunzip_members(payload: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream — Common Crawl
    writes one member per record; plain files pass through untouched."""
    if payload[:2] != b"\x1f\x8b":
        return payload
    out = bytearray()
    rest = payload
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out += d.decompress(rest, MAX_RECORD_BYTES + 1)
        if not d.eof:
            raise ValueError("warc: gzip member exceeds the record cap")
        rest = d.unused_data
    if rest.strip(b"\x00"):
        raise ValueError("warc: trailing garbage after gzip members")
    return bytes(out)


def _parse_warc_date(s: str) -> datetime | None:
    """WARC-Date is ISO-8601 UTC (e.g. 2024-01-02T03:04:05Z)."""
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None
    return dt.astimezone(timezone.utc).replace(tzinfo=None)


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope from an application/http payload —
    the stored page bytes start after the blank line."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(b"\r\n\r\n")
        if sep < 0:
            sep = payload.find(b"\n\n")
            return payload[sep + 2 :] if sep >= 0 else b""
        return payload[sep + 4 :]
    return payload


def parse_warc_records(
    payload: bytes,
) -> Iterator[tuple[str | None, datetime | None, bytes]]:
    """Yield ``(url, warc_ts, html)`` for every **response** record of one
    WARC file (request/metadata/warcinfo records are framing, not pages).
    Raises ValueError on malformed framing — the Spark surface converts
    that to a per-file error row."""
    data = _gunzip_members(bytes(payload))
    pos, n = 0, len(data)
    n_records = 0
    while pos < n:
        # skip inter-record separators (two CRLFs per spec; body bytes are
        # length-consumed, so bare CR/LF here is always framing)
        while pos < n and data[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n:
            break
        line_end = data.find(b"\n", pos)
        if line_end < 0:
            break
        version = data[pos:line_end].strip()
        if not version.startswith(b"WARC/"):
            raise ValueError(f"warc: bad version line at byte {pos}")
        pos = line_end + 1
        headers: dict[str, str] = {}
        for _ in range(MAX_HEADER_LINES):
            line_end = data.find(b"\n", pos)
            if line_end < 0:
                raise ValueError("warc: truncated header block")
            line = data[pos:line_end].rstrip(b"\r")
            pos = line_end + 1
            if not line:
                break
            k, _, v = line.partition(b":")
            headers[k.decode("latin-1").strip().lower()] = v.decode(
                "latin-1", "replace"
            ).strip()
        else:
            raise ValueError("warc: header block exceeds the line cap")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            raise ValueError("warc: missing/invalid Content-Length") from None
        if length < 0 or length > MAX_RECORD_BYTES:
            raise ValueError(f"warc: record payload {length} outside cap")
        body = data[pos : pos + length]
        pos += length
        n_records += 1
        if n_records > MAX_RECORDS_PER_FILE:
            raise ValueError("warc: record count exceeds the per-file cap")
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        ts = _parse_warc_date(headers.get("warc-date", ""))
        yield url, ts, _http_body(body)


PAGES_FROM_WARC_SCHEMA = T.StructType(
    [
        T.StructField("src_file", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("error", T.StringType()),
    ]
)


def read_warc_files(spark: SparkSession, path: str) -> DataFrame:
    """WARC shard files → ``(src_file, url, warc_ts, html, error)``.
    Response records become page rows; a file that fails to parse yields
    ONE error row. Chain ``.select("url","warc_ts","html")`` plus a text
    extraction to feed ValidationEngine's PAGES shape."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                try:
                    for url, ts, html in parse_warc_records(content):
                        out.append((path_, url, ts, html, None))
                except Exception as exc:  # noqa: BLE001 — a finding, not a crash
                    out.append((path_, None, None, None, str(exc)[:256]))
            yield pd.DataFrame(
                out, columns=["src_file", "url", "warc_ts", "html", "error"]
            )

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(parse, PAGES_FROM_WARC_SCHEMA)
