"""WARC source (sources/warc.py): ISO 28500 framing, Common-Crawl
member-per-record gzip, record-taxonomy filtering, HTTP envelope
stripping, and bomb guards. The committed fixture's exact rows are also
pinned by the warc_pages driver oracle."""

from __future__ import annotations

import gzip
import io
import os

import pytest

from gbif_data_validator_spark.sources.warc import (
    MAX_RECORD_BYTES,
    parse_warc_records,
    read_warc_files,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "warc")


def _record(wtype, uri, date, body, http=True):
    payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body) if http else body
    head = f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
    if uri:
        head += f"WARC-Target-URI: {uri}\r\n"
    head += f"WARC-Date: {date}\r\nContent-Length: {len(payload)}\r\n\r\n"
    return head.encode() + payload + b"\r\n\r\n"


def test_fixture_rows_exact():
    with open(os.path.join(FIXTURES, "pages.warc.gz"), "rb") as f:
        rows = list(parse_warc_records(f.read()))
    assert [(u, h) for u, _, h in rows] == [
        ("https://warc.example/a", b"<html><body><p>alpha page</p></body></html>"),
        ("https://warc.example/b", b"<html><body><p>beta page</p></body></html>"),
        ("https://warc.example/c", b"<p>gamma</p>"),
    ]
    assert rows[0][1].isoformat() == "2024-01-02T03:04:05"


def test_non_response_records_skipped_and_envelope_stripped():
    warc = (
        _record("warcinfo", None, "2024-01-01T00:00:00Z", b"software: t", http=False)
        + _record("request", "https://x/1", "2024-01-02T00:00:00Z", b"GET / HTTP/1.1", http=False)
        + _record("response", "https://x/1", "2024-01-02T00:00:00Z", b"<b>hi</b>")
        + _record("metadata", "https://x/1", "2024-01-02T00:00:00Z", b"ok", http=False)
    )
    (row,) = list(parse_warc_records(warc))
    assert row == ("https://x/1", row[1], b"<b>hi</b>")


def test_gzip_encodings():
    plain = _record("response", "https://x/2", "2024-05-06T07:08:09Z", b"<i>2</i>")
    whole = gzip.compress(plain + plain.replace(b"/2", b"/3"))
    assert len(list(parse_warc_records(whole))) == 2
    members = b""
    for i in (4, 5):
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gf:
            gf.write(_record("response", f"https://x/{i}", "2024-05-06T07:08:09Z", b"<i>m</i>"))
        members += buf.getvalue()
    assert [u for u, _, _ in parse_warc_records(members)] == ["https://x/4", "https://x/5"]


def test_bomb_and_corruption_guards():
    with pytest.raises(ValueError, match="bad version"):
        list(parse_warc_records(b"NOT A WARC\n\n"))
    # declared Content-Length beyond the cap must refuse before slicing
    huge = (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: {MAX_RECORD_BYTES + 1}\r\n\r\n"
    ).encode()
    with pytest.raises(ValueError, match="outside cap"):
        list(parse_warc_records(huge))
    # a gzip bomb member (tiny compressed, giant decompressed) must refuse
    bomb = gzip.compress(b"\x00" * (MAX_RECORD_BYTES + 2))
    with pytest.raises(ValueError, match="exceeds the record cap"):
        list(parse_warc_records(bomb))


def test_spark_surface_and_error_rows(spark, tmp_path):
    import shutil

    wdir = tmp_path / "warc"
    wdir.mkdir()
    shutil.copy(os.path.join(FIXTURES, "pages.warc.gz"), wdir / "pages.warc.gz")
    (wdir / "broken.warc").write_bytes(b"garbage that is not a warc\n\n")
    rows = read_warc_files(spark, str(wdir)).collect()
    good = [r for r in rows if r.error is None]
    bad = [r for r in rows if r.error is not None]
    assert len(good) == 3 and {r.url for r in good} == {
        "https://warc.example/a", "https://warc.example/b", "https://warc.example/c"
    }
    assert all(isinstance(r.html, (bytes, bytearray)) for r in good)
    (err,) = bad
    assert "bad version" in err.error and err.url is None
