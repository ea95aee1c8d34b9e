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


# ---------------------------------------------------------------------------
# EML metadata-DOCUMENT validation (XSD analog)
# ---------------------------------------------------------------------------
# Reference analog: XML-schema validation of the dataset metadata document —
# xml/XMLSchemaValidatorProvider.java (javax.xml.validation against the
# GBIF EML profile XSD) used by EmlResourceStructureEvaluator.java:41-66
# (EML_NOT_FOUND / EML_GBIF_SCHEMA findings). This is a stdlib structural
# validator against a DECLARED SUBSET of the public GBIF EML profile
# schema: root element + required attributes, dataset cardinality,
# required dataset elements, agent shape, and simple-type checks. It does
# not implement full XSD semantics (declared limit); everything it does
# check maps to a schema violation the reference's validator would also
# raise. Findings, not crashes: every problem is a message in the returned
# list.

import re as _re
from xml.etree import ElementTree as _ET

_EML_DTD_RE = _re.compile(rb"<!(?:DOCTYPE|ENTITY)", _re.IGNORECASE)

#: eml.xsd: packageId + system are required attributes of <eml>
EML_REQUIRED_ROOT_ATTRS = ("packageId", "system")
#: GBIF EML profile: required children of <dataset> (subset)
EML_REQUIRED_DATASET_ELEMENTS = ("title", "creator", "contact")
#: responsible-party elements that must carry at least one name field
_EML_AGENT_ELEMENTS = ("creator", "metadataProvider", "contact",
                       "associatedParty")
_EML_AGENT_NAME_FIELDS = ("individualName", "organizationName",
                          "positionName")
#: pubDate simple type: calendarDate — YYYY or YYYY-MM-DD
_EML_DATE_RE = _re.compile(r"^\d{4}(-\d{2}-\d{2})?$")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def validate_eml_document(data: bytes) -> list[str]:
    """Structural validation of an EML metadata document against the
    bundled GBIF-profile schema subset → list of violation messages
    (empty = valid). Never raises on document content."""
    if _EML_DTD_RE.search(data):
        return ["doctype/entity declaration rejected"]
    try:
        root = _ET.fromstring(data)
    except _ET.ParseError as e:
        return [f"not well-formed: {e}"]
    violations: list[str] = []
    if _local(root.tag) != "eml":
        return [f"root element <{_local(root.tag)}>, expected <eml:eml>"]
    for attr in EML_REQUIRED_ROOT_ATTRS:
        if not (root.get(attr) or "").strip():
            violations.append(f"<eml> missing required attribute '{attr}'")
    datasets = [c for c in root if _local(c.tag) == "dataset"]
    if len(datasets) != 1:
        violations.append(
            f"expected exactly 1 <dataset> element, found {len(datasets)}"
        )
        return violations
    ds = datasets[0]
    present = {_local(c.tag) for c in ds}
    for req in EML_REQUIRED_DATASET_ELEMENTS:
        if req not in present:
            violations.append(f"<dataset> missing required <{req}>")
    # title must be non-empty text
    for c in ds:
        if _local(c.tag) == "title" and not (c.text or "").strip():
            violations.append("<title> is empty")
    # agents need at least one name field (responsible-party shape)
    for c in ds:
        if _local(c.tag) in _EML_AGENT_ELEMENTS:
            fields = {_local(g.tag) for g in c}
            if not fields & set(_EML_AGENT_NAME_FIELDS):
                violations.append(
                    f"<{_local(c.tag)}> has none of "
                    f"{'/'.join(_EML_AGENT_NAME_FIELDS)}"
                )
    # simple-type checks
    for c in ds:
        if _local(c.tag) == "pubDate":
            txt = (c.text or "").strip()
            if txt and not _EML_DATE_RE.match(txt):
                violations.append(
                    f"<pubDate> '{txt}' is not YYYY or YYYY-MM-DD"
                )
    return violations


def eml_to_meta(data: bytes) -> dict:
    """Extract the content-lint fields (M4) from an EML document:
    title, description (abstract paras joined), license
    (intellectualRights text, mapped to an SPDX-ish id when stated) —
    feeds ``lint_metadata`` so document-backed runs get the same content
    battery as config-backed runs."""
    try:
        root = _ET.fromstring(data)
    except _ET.ParseError:
        return {}
    ds = next((c for c in root if _local(c.tag) == "dataset"), None)
    if ds is None:
        return {}
    meta: dict = {}
    paras: list[str] = []
    for c in ds.iter():
        tag = _local(c.tag)
        if tag == "title" and "title" not in meta:
            meta["title"] = (c.text or "").strip()
        elif tag == "para":
            paras.append((c.text or "").strip())
        elif tag == "intellectualRights" and "license" not in meta:
            text = " ".join(t.strip() for t in c.itertext() if t.strip())
            up = text.upper()
            if "CC0" in up or "PUBLIC DOMAIN" in up:
                meta["license"] = "CC0-1.0"
            elif "CC-BY-SA" in up or "CC BY-SA" in up:
                meta["license"] = "CC-BY-SA-4.0"
            elif "CC-BY-NC" in up or "CC BY-NC" in up:
                meta["license"] = "CC-BY-NC-4.0"
            elif "CC-BY" in up or "CC BY" in up:
                meta["license"] = "CC-BY-4.0"
            elif text:
                meta["license"] = text
    if paras:
        meta["description"] = " ".join(p for p in paras if p)
    return meta
