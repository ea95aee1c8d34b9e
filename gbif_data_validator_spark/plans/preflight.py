"""Pass 0 — resource-structure preflight (driver-side, no jobs triggered).

Reference analogs (SURVEY.md §2.7):
- meta.xml exists / archive readable → table readable + schema obtainable
  (evaluator/DwcaResourceStructureEvaluator.java:55-88)
- required / unknown / duplicated terms → column-set comparison
  (DwcaResourceStructureEvaluator.java:96-121)
- record identifier present → key column exists
  (evaluator/PrerequisiteEvaluator.java:22-38)
- early-stop on RESOURCE_INTEGRITY → engine short-circuits on any blocking
  preflight finding (evaluator/ResourceConstitutionEvaluationChain.java:58-92,
  break predicate :114-121)

All checks inspect only the DataFrame's StructType — zero Spark jobs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..model import BLOCKING_CHECKS, CheckId, PAGES_SCHEMA


@dataclass
class PreflightFinding:
    check_id: str
    expected: str
    found: str

    @property
    def blocking(self) -> bool:
        return self.check_id in BLOCKING_CHECKS


def preflight(
    df: DataFrame,
    expected_schema: T.StructType = PAGES_SCHEMA,
    key_col: str = "url",
    required_cols: tuple[str, ...] | None = None,
) -> list[PreflightFinding]:
    """Structural findings for the input table. Unknown columns are
    non-blocking findings (reference: UNKNOWN_TERM is reported, not fatal);
    missing required columns and a missing key column are blocking."""
    findings: list[PreflightFinding] = []
    actual = {f.name: f.dataType for f in df.schema.fields}
    expected = {f.name: f.dataType for f in expected_schema.fields}
    required = set(required_cols) if required_cols is not None else set(expected)

    for name in sorted(required - set(actual)):
        findings.append(
            PreflightFinding(CheckId.REQUIRED_TERM_MISSING, name, "absent")
        )
    for name in sorted(set(actual) - set(expected)):
        findings.append(PreflightFinding(CheckId.UNKNOWN_TERM, "", name))
    for name in sorted(set(actual) & set(expected)):
        if actual[name] != expected[name]:
            findings.append(
                PreflightFinding(
                    CheckId.COLUMN_TYPE_MISMATCH,
                    f"{name}:{expected[name].simpleString()}",
                    f"{name}:{actual[name].simpleString()}",
                )
            )
    if key_col not in actual:
        findings.append(
            PreflightFinding(CheckId.RECORD_IDENTIFIER_NOT_FOUND, key_col, "absent")
        )
    return findings


def schema_diff(a: DataFrame, b: DataFrame) -> list[tuple]:
    """Table-vs-table schema evolution diff — the incremental-append
    pre-flight: before chaining run N+1 onto a work_dir, confirm the new
    month's table still matches the baseline's shape. Same check family as
    ``preflight`` (schema vs the declared StructType) but between two live
    tables. Pure metadata — no Spark jobs.

    → sorted (column, status ∈ added|removed|type_changed, type_a, type_b)
    tuples; empty = identical schemas (column order is NOT a difference —
    Spark reads by name)."""
    ta = {f.name: f.dataType.simpleString() for f in a.schema.fields}
    tb = {f.name: f.dataType.simpleString() for f in b.schema.fields}
    out: list[tuple] = []
    for name in sorted(set(ta) | set(tb)):
        if name not in tb:
            out.append((name, "removed", ta[name], None))
        elif name not in ta:
            out.append((name, "added", None, tb[name]))
        elif ta[name] != tb[name]:
            out.append((name, "type_changed", ta[name], tb[name]))
    return out
