"""Generate the deterministic WARC fixture (tests/fixtures/warc/) — one
Common-Crawl-convention archive (gzip member per record, mtime pinned to 0
so the bytes are reproducible). Content exercises the record taxonomy the
parser must honor: warcinfo/request records skipped, response records
emitted with the HTTP envelope stripped, CRLF framing."""

from __future__ import annotations

import gzip
import io
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "warc")


def _record(wtype: str, uri: str | None, date: str, body: bytes, http: bool = True) -> bytes:
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" + body
        if http
        else body
    )
    head = f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
    if uri:
        head += f"WARC-Target-URI: {uri}\r\n"
    head += f"WARC-Date: {date}\r\nContent-Length: {len(payload)}\r\n\r\n"
    return head.encode() + payload + b"\r\n\r\n"


def _gz_member(data: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gf:
        gf.write(data)
    return buf.getvalue()


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    records = [
        _record("warcinfo", None, "2024-01-01T00:00:00Z", b"software: fixture", http=False),
        _record("request", "https://warc.example/a", "2024-01-02T03:04:05Z", b"GET /a HTTP/1.1", http=False),
        _record("response", "https://warc.example/a", "2024-01-02T03:04:05Z", b"<html><body><p>alpha page</p></body></html>"),
        _record("response", "https://warc.example/b", "2024-02-03T04:05:06Z", b"<html><body><p>beta page</p></body></html>"),
        _record("metadata", "https://warc.example/b", "2024-02-03T04:05:06Z", b"fetch: ok", http=False),
        _record("response", "https://warc.example/c", "2024-03-04T05:06:07Z", b"<p>gamma</p>"),
    ]
    with open(os.path.join(OUT, "pages.warc.gz"), "wb") as f:
        for r in records:
            f.write(_gz_member(r))
    print("wrote fixtures to", os.path.abspath(OUT))


if __name__ == "__main__":
    main()
