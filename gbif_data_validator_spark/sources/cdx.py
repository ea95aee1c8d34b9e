"""CDX-JSON crawl-index source: the Common-Crawl-convention index format
(`cdxj`: one line per capture — SURT key, 14-digit timestamp, JSON
payload) parsed into a typed capture table with pure Column algebra.

Reference analog: the reference's tabular record sources declare a schema
and convert malformed cells into findings (DwC-A/CSV readers,
validator-processor source package); this is the same contract over the
index format that fronts every web-scale crawl corpus: the CDX table is
what a pipeline PLANS from (which WARC files to fetch, which offsets to
range-read) before it touches a byte of page payload.

Scale design: parsing is one narrow projection over `spark.read.text`
lines — regex/split/from_json Column ops end to end: no UDF, no shuffle,
whole-stage-codegen'd, and the scan parallelizes by line ranges exactly
like any text source. A malformed line is an ERROR ROW ("a finding,
never a crash"), so one corrupt index shard cannot kill a 10^12-capture
planning job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: string-typed JSON payload per the CDX-JSON convention (all scalar
#: values are JSON strings; numerics are re-typed after extraction)
_PAYLOAD_SCHEMA = (
    "url string, mime string, status string, digest string, "
    "length string, offset string, filename string, _corrupt string"
)

CDX_COLUMNS = [
    "surt",
    "capture_ts",
    "url",
    "mime",
    "status",
    "digest",
    "length",
    "offset",
    "filename",
    "error",
]


def cdx_lines_to_table(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """``(surt, capture_ts, url, mime, status, digest, length, offset,
    filename, error)`` from raw cdxj lines.

    Line grammar: ``<surt> <ts14> <json>`` (two single-space separators;
    the JSON may itself contain spaces, so the split is limit-3). Errors
    — short line, unparseable timestamp, undecodable JSON, payload
    without a url — surface as rows with ``error`` set and all capture
    fields NULL, preserving input cardinality: every index line is
    accounted for, parsed or explained."""
    line = F.col(line_col)
    parts = F.split(line, " ", 3)
    surt = F.element_at(parts, 1)
    ts_raw = F.try_element_at(parts, F.lit(2))
    payload_raw = F.try_element_at(parts, F.lit(3))
    ts = F.try_to_timestamp(ts_raw, F.lit("yyyyMMddHHmmss"))
    payload = F.from_json(
        payload_raw,
        _PAYLOAD_SCHEMA,
        {"columnNameOfCorruptRecord": "_corrupt"},
    )

    error = (
        F.when(F.size(parts) < 3, F.lit("CDX_LINE_SHORT"))
        .when((F.length(ts_raw) != 14) | ts.isNull(), F.lit("CDX_TS_INVALID"))
        .when(
            payload.isNull() | payload["_corrupt"].isNotNull(),
            F.lit("CDX_JSON_INVALID"),
        )
        .when(payload["url"].isNull(), F.lit("CDX_URL_MISSING"))
    )
    ok = error.isNull()

    def field(c):
        return F.when(ok, c)

    passthrough = [c for c in lines.columns if c != line_col]
    return lines.select(
        *passthrough,
        field(surt).alias("surt"),
        field(ts).alias("capture_ts"),
        field(payload["url"]).alias("url"),
        field(payload["mime"]).alias("mime"),
        field(payload["status"].try_cast("int")).alias("status"),
        field(payload["digest"]).alias("digest"),
        field(payload["length"].try_cast("long")).alias("length"),
        field(payload["offset"].try_cast("long")).alias("offset"),
        field(payload["filename"]).alias("filename"),
        error.alias("error"),
    )


def read_cdx_files(spark: SparkSession, path: str) -> DataFrame:
    """cdxj shard files/glob → the typed capture table (plus ``src_file``).
    Blank lines are dropped (trailing-newline artifacts, not captures)."""
    lines = (
        spark.read.text(path)
        .select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("src_file"),
            F.col("value"),
        )
        .where(F.length(F.trim(F.col("value"))) > 0)
    )
    return cdx_lines_to_table(lines)


def fetch_plan(
    cdx: DataFrame,
    max_gap_bytes: int = 65536,
    min_captures: int = 1,
) -> DataFrame:
    """Coalesced WARC range-read plan from a CDX capture table →
    ``(filename, range_start, range_end, n_captures, range_bytes)``.

    The planning step between the index and the bytes: issuing one ranged
    GET per capture at 10^12 captures is 10^12 round trips; reading whole
    shards re-downloads everything between wanted records. The planner
    sorts each shard's captures by offset and merges neighbors whose gap
    is ≤ ``max_gap_bytes`` (cheaper to over-read a small gap than to open
    a new connection) into one contiguous range — the classic
    request-coalescing trade, made explicit and deterministic.

    Plan shape: ONE window partitioned by filename (ordered by offset —
    range membership is a running sum over gap breaks, the sessionize
    pattern) + one (filename, range) agg. Shard grain bounds the window:
    a WARC shard is ~1 GB / ~50k captures, so no partition is ever large;
    error rows and rows without offsets are excluded (they cannot be
    fetched — surface them via the ``error`` column upstream)."""
    w = Window.partitionBy("filename").orderBy("offset", "length")
    rows = cdx.where(
        F.col("error").isNull()
        & F.col("filename").isNotNull()
        & F.col("offset").isNotNull()
        & F.col("length").isNotNull()
    )
    prev_end = F.lag(F.col("offset") + F.col("length")).over(w)
    new_range = (
        prev_end.isNull() | (F.col("offset") > prev_end + F.lit(max_gap_bytes))
    ).cast("long")
    ranged = rows.withColumn("_rid", F.sum(new_range).over(w))
    return (
        ranged.groupBy("filename", "_rid")
        .agg(
            F.min("offset").alias("range_start"),
            F.max(F.col("offset") + F.col("length")).alias("range_end"),
            F.count(F.lit(1)).cast("long").alias("n_captures"),
        )
        .where(F.col("n_captures") >= min_captures)
        .select(
            "filename",
            "range_start",
            "range_end",
            "n_captures",
            (F.col("range_end") - F.col("range_start")).alias("range_bytes"),
        )
    )


def best_captures(cdx: DataFrame) -> DataFrame:
    """One capture per URL from a CDX table — the index-side dedup that
    runs BEFORE ``fetch_plan``: fetching every historical capture of a
    url multiplies the byte bill by the recrawl count for no new content.

    Policy (deterministic, totally ordered): prefer status 200 over
    everything else, then the LATEST capture_ts (freshest content), then
    the smallest (filename, offset) as the final tie-break so re-runs and
    engines agree. Error rows and rows without a url are excluded — they
    have nothing to fetch.

    Plan: ONE window partitioned by url (rank order only, no frame).
    URL grain is the natural partition key — no hot keys (a url's capture
    count is the recrawl cadence, bounded), no skew guard needed."""
    w = Window.partitionBy("url").orderBy(
        F.when(F.col("status") == 200, 0).otherwise(1).asc(),
        F.col("capture_ts").desc(),
        F.col("filename").asc(),
        F.col("offset").asc(),
    )
    return (
        cdx.where(F.col("error").isNull() & F.col("url").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


#: RFC-4648 base32 alphabet — the WARC-Payload-Digest convention
_DIGEST_RE = r"^[A-Z2-7]{8,40}$"


def cdx_checks(cdx: DataFrame) -> DataFrame:
    """Validation battery over a CDX capture table →
    ``(surt, url, check_id, found)`` — the record-structure pass for the
    INDEX itself. A crawl pipeline trusts the index to plan fetches;
    validating it is 10^4× cheaper than discovering a corrupt shard
    mid-fetch.

    Checks (each one more nullable slot in ONE projection — the engine's
    pass-1 discipline, zero shuffles):
      - CDX_* parse errors forwarded as findings (line grammar already
        typed them),
      - SURT_URL_MISMATCH: the SURT key recomputed from the url
        (reversed-host + ')' + path, the standard transform) must match —
        a mismatch means the index was built against a different
        canonicalizer than the reader assumes,
      - STATUS_INVALID: HTTP status outside 100..599,
      - DIGEST_MALFORMED: payload digest not base32 (RFC 4648, the
        WARC-Payload-Digest convention),
      - LENGTH_NONPOSITIVE: record length ≤ 0 (unfetchable range),
      - CAPTURE_TS_UNLIKELY: before the 1996 web-archive epoch or after
        2035 (clock damage)."""
    host = F.regexp_extract(F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    path = F.regexp_extract(F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    surt_expected = F.concat(
        F.array_join(F.reverse(F.split(F.lower(host), r"\.")), ","),
        F.lit(")"),
        F.when(path == "", F.lit("/")).otherwise(F.lower(path)),
    )
    checks = [
        (
            "SURT_URL_MISMATCH",
            F.col("surt").isNotNull() & (F.col("surt") != surt_expected),
            surt_expected,
        ),
        (
            "STATUS_INVALID",
            F.col("status").isNotNull()
            & ((F.col("status") < 100) | (F.col("status") > 599)),
            F.col("status").cast("string"),
        ),
        (
            "DIGEST_MALFORMED",
            F.col("digest").isNotNull() & ~F.col("digest").rlike(_DIGEST_RE),
            F.col("digest"),
        ),
        (
            "LENGTH_NONPOSITIVE",
            F.col("length").isNotNull() & (F.col("length") <= 0),
            F.col("length").cast("string"),
        ),
        (
            "CAPTURE_TS_UNLIKELY",
            F.col("capture_ts").isNotNull()
            & (
                (F.col("capture_ts") < F.lit("1996-01-01").cast("timestamp"))
                | (F.col("capture_ts") >= F.lit("2036-01-01").cast("timestamp"))
            ),
            F.col("capture_ts").cast("string"),
        ),
    ]
    findings = F.array(
        *[
            F.when(cond, F.struct(F.lit(cid).alias("check_id"), found.alias("found")))
            for cid, cond, found in checks
        ]
    )
    field_rows = (
        cdx.where(F.col("error").isNull())
        .select(
            "surt",
            "url",
            F.explode(F.filter(findings, lambda x: x.isNotNull())).alias("f"),
        )
        .select("surt", "url", F.col("f.check_id").alias("check_id"), F.col("f.found").alias("found"))
    )
    error_rows = cdx.where(F.col("error").isNotNull()).select(
        "surt", "url", F.col("error").alias("check_id"), F.lit(None).cast("string").alias("found")
    )
    return field_rows.unionByName(error_rows)
