"""PII detection and redaction for web-text curation pipelines.

No direct reference analog (the reference validates biodiversity records);
this extends the per-record interpretation pass (SURVEY.md §2.6) with the
scrubbing step every Common-Crawl-derived training corpus needs before
release: find and mask emails, IPv4 addresses, SSN-shaped ids, phone
numbers and credit-card-shaped digit runs.

Everything is JVM-side Column algebra over ``regexp_count`` /
``regexp_replace`` — zero shuffles, composes into the single pass-1 scan,
and oracle-checkable because each pattern is written in the regex dialect
intersection of Java (Spark) and RE2 (DuckDB): no lookaround, no
backreferences, ASCII classes only.

Scale: a pure narrow map — the 100 TB plan is the scan itself; redaction
adds no exchange and stays inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Patterns deliberately restricted to the Java-regex ∩ RE2 dialect.
#: RFC-ish email (the pragmatic crawl-scrubbing pattern, not full RFC 5322)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
#: dotted-quad IPv4 (no octet-range check — scrubbing favors recall)
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
#: US-SSN-shaped 3-2-4 digit id
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
#: international phone: +CC separator-delimited groups (require the + prefix
#: so bare numeric ids in crawl text don't mass-match)
PHONE_RE = r"\+\d{1,3}[- ]\d{3}[- ]\d{3,4}[- ]\d{4}"
#: 16-digit card-shaped run, 4x4 grouped or contiguous
CC_RE = r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b"

#: (name, pattern, mask) in redaction order. Order matters: SSN/CC/phone
#: are redacted before bare IPv4 so a dotted-quad never steals digits from
#: a longer structured match; the oracle SQL must nest replacements in the
#: same order.
PII_PATTERNS = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("cc", CC_RE, "<CC>"),
    ("ssn", SSN_RE, "<SSN>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ipv4", IPV4_RE, "<IP>"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts, ``{name: Column<int>}``; null text → 0s.

    Counts run on the RAW text (before redaction), so an IPv4 embedded in a
    phone-shaped string counts for both — detection favors recall and the
    counts are diagnostics, not an allocation."""
    return {
        name: F.coalesce(F.regexp_count(text, F.lit(pat)), F.lit(0))
        for name, pat, _ in PII_PATTERNS
    }


def pii_redact(text: Column) -> Column:
    """Text with every PII match replaced by its ``<KIND>`` mask, applied
    in ``PII_PATTERNS`` order; null passes through as null."""
    out = text
    for _, pat, mask in PII_PATTERNS:
        out = F.regexp_replace(out, pat, mask)
    return out


def pii_total(text: Column) -> Column:
    """Total PII matches of any kind (the per-doc scrub-pressure metric)."""
    cols = list(pii_counts(text).values())
    total = cols[0]
    for c in cols[1:]:
        total = total + c
    return total
