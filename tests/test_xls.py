"""Legacy .xls (BIFF8/CFB) parser — pinned against the reference's real-
Excel fixture and its golden CSV conversion
(validator-processor/src/test/resources/workbooks/occurrence-workbook.xls
→ occurrence-workbook-no-empty-last-line.csv, the POI convertExcelToCSV
output with instant-rendered dates). The fixture is read from the
read-only reference checkout at test time (never copied into this repo);
tests skip cleanly where it isn't mounted."""

from __future__ import annotations

import os
import shutil

import pytest

from gbif_data_validator_spark.sources.spreadsheets import (
    detect_spreadsheet_format,
    parse_workbook_rows,
    workbook_table,
)
from gbif_data_validator_spark.sources.xls import cfb_stream, parse_xls_rows

_REF_XLS = (
    "/root/reference/validator-processor/src/test/resources/workbooks/"
    "occurrence-workbook.xls"
)

needs_fixture = pytest.mark.skipif(
    not os.path.exists(_REF_XLS), reason="reference .xls fixture not mounted"
)


def _payload() -> bytes:
    with open(_REF_XLS, "rb") as f:
        return f.read()


@needs_fixture
def test_detects_and_parses_reference_fixture():
    payload = _payload()
    assert detect_spreadsheet_format(payload) == "xls-legacy"
    fmt, rows = parse_workbook_rows(payload)
    assert fmt == "xls-legacy"
    assert rows[0] == ["occurrenceId", "eventDate", "elevation"]


@needs_fixture
def test_matches_reference_golden_csv():
    """Cell-for-cell parity with the reference's POI conversion output:
    ints render bare, floats keep precision, date cells become ISO
    instants, the '20 000' grouped-number cell stays a string."""
    headers, data, n_lines = workbook_table(_payload())
    assert headers == ["occurrenceId", "eventDate", "elevation"]
    assert data == [
        ["1", "1990-01-02T00:00:00Z", "1"],
        ["2", "1990-01-03T00:00:00Z", "1.2"],
        ["3", "1990-01-04T02:10:00Z", "1.3"],
        ["4", "1990-01-05T17:00:00Z", "20 000"],
        ["5", "", ""],
    ]
    assert n_lines == 6


@needs_fixture
def test_xls_agrees_with_sibling_formats():
    """The same table saved as .xls, .xlsx and .ods must parse to the
    identical (headers, data) — one semantics across all four formats."""
    base = os.path.dirname(_REF_XLS)
    want = workbook_table(_payload())[:2]
    for sibling in ("occurrence-workbook.xlsx", "occurrence-workbook.ods"):
        with open(os.path.join(base, sibling), "rb") as f:
            assert workbook_table(f.read())[:2] == want, sibling


def test_corrupt_xls_raises_not_crashes():
    with pytest.raises(ValueError, match="cfb"):
        list(parse_xls_rows(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 600))
    with pytest.raises(ValueError, match="magic"):
        cfb_stream(b"not a cfb file at all" * 30)


@needs_fixture
def test_xls_flows_through_spark_surface(spark, tmp_path):
    """binaryFile → mapInPandas path: .xls rows land in the same long
    format as the zip-based formats, error-free."""
    from gbif_data_validator_spark.sources.spreadsheets import (
        read_spreadsheet_files,
        spreadsheet_table,
    )

    wbdir = tmp_path / "wb"
    wbdir.mkdir()
    shutil.copy(_REF_XLS, wbdir / "occurrence-workbook.xls")
    rows = read_spreadsheet_files(spark, str(wbdir)).collect()
    assert all(r.error is None for r in rows)
    assert {r.fmt for r in rows} == {"xls-legacy"}
    table = spreadsheet_table(spark, str(wbdir))
    got = {r.occurrenceId: (r.eventDate, r.elevation) for r in table.collect()}
    assert got["4"] == ("1990-01-05T17:00:00Z", "20 000")
    assert len(got) == 5
