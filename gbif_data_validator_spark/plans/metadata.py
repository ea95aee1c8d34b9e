"""M3/M4 — run-config / metadata content lint (driver-side).

Reference analog: BasicMetadataEvaluator — title ≥ 10 chars, description
≥ 25 chars, license known, contacts complete
(evaluator/BasicMetadataEvaluator.java:36-117); license is the one blocking
finding (IndexableRules: LICENSE_MISSING_OR_UNKNOWN,
evaluator/IndexableRulesTest.java:19-22). For a table-validation engine the
"metadata document" is the run config / table properties.
"""

from __future__ import annotations

from ..model import CheckId
from .preflight import PreflightFinding

KNOWN_LICENSES = {
    "CC0-1.0", "CC-BY-4.0", "CC-BY-SA-4.0", "CC-BY-NC-4.0",
    "ODC-BY-1.0", "ODbL-1.0", "PDDL-1.0",
}

MIN_TITLE = 10
MIN_DESCRIPTION = 25


def lint_metadata(meta: dict) -> list[PreflightFinding]:
    """Lint a run/table metadata dict: title, description, license, contact.
    Only the unknown/missing license blocks (mirrors IndexableRules)."""
    findings: list[PreflightFinding] = []
    title = (meta.get("title") or "").strip()
    if len(title) < MIN_TITLE:
        findings.append(
            PreflightFinding(CheckId.TITLE_TOO_SHORT, f">= {MIN_TITLE} chars", title or "absent")
        )
    desc = (meta.get("description") or "").strip()
    if len(desc) < MIN_DESCRIPTION:
        findings.append(
            PreflightFinding(
                CheckId.DESCRIPTION_TOO_SHORT, f">= {MIN_DESCRIPTION} chars", desc or "absent"
            )
        )
    lic = (meta.get("license") or "").strip()
    if lic not in KNOWN_LICENSES:
        findings.append(
            PreflightFinding(
                CheckId.LICENSE_MISSING_OR_UNKNOWN,
                "one of " + ", ".join(sorted(KNOWN_LICENSES)),
                lic or "absent",
            )
        )
    return findings
