"""Write the deterministic cdxj fixture shards under tests/fixtures/cdx/.

Two shards in the Common-Crawl cdxj convention (`<surt> <ts14> <json>`),
including every malformed-line class the source must convert into error
rows. Byte-deterministic: re-running reproduces identical files, so the
`cdx_scan` oracle can state the expected table as VALUES.
"""

from __future__ import annotations

import os

FIX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "cdx",
)

SHARD_A = "\n".join(
    [
        'com,example)/ 20240102030405 {"url": "https://example.com/", "mime": "text/html", "status": "200", "digest": "AAAABBBB", "length": "1234", "offset": "0", "filename": "crawl-00.warc.gz"}',
        'com,example)/about 20240102030406 {"url": "https://example.com/about", "mime": "text/html", "status": "301", "digest": "CCCCDDDD", "length": "321", "offset": "1234", "filename": "crawl-00.warc.gz"}',
        "com,broken)/short 20240102030407",
        'org,site)/a 20241301000000 {"url": "https://site.org/a", "mime": "text/html", "status": "200", "digest": "EEEE", "length": "10", "offset": "2", "filename": "x.warc.gz"}',
    ]
) + "\n"

SHARD_B = "\n".join(
    [
        'org,wiki)/page 20240215120000 {"url": "https://wiki.org/page", "mime": "text/plain", "status": "200", "digest": "FFFF0000", "length": "77", "offset": "99", "filename": "crawl-01.warc.gz"}',
        "org,bad)/json 20240215120001 {not json at all}",
        'org,nourl)/x 20240215120002 {"mime": "text/html", "status": "404"}',
        'net,cdn)/asset 20240215120003 {"url": "https://cdn.net/asset", "mime": "image/png", "status": "200", "digest": "11112222", "length": "204800", "offset": "4096", "filename": "crawl-01.warc.gz"}',
        "",
    ]
) + "\n"


def main() -> None:
    os.makedirs(FIX, exist_ok=True)
    for name, body in (("index-00.cdxj", SHARD_A), ("index-01.cdxj", SHARD_B)):
        with open(os.path.join(FIX, name), "w") as fh:
            fh.write(body)
        print(f"wrote {name} ({len(body)} bytes)")


if __name__ == "__main__":
    main()
