"""Property-based roundtrip: random cell grids → minimal xlsx/ods bytes →
parse_workbook_rows recovers the grid. Catches escaping, gap-filling, and
repeat-expansion bugs the fixed fixtures can't."""

from __future__ import annotations

import io
import zipfile
from xml.sax.saxutils import escape

from hypothesis import given, settings
from hypothesis import strategies as st

from gbif_data_validator_spark.sources.spreadsheets import parse_workbook_rows

# printable text incl. XML-special chars and unicode, no control chars
CELL = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cc", "Cs"), max_codepoint=0x2FFF
    ),
    max_size=12,
)
GRID = st.lists(st.lists(CELL, min_size=1, max_size=5), min_size=1, max_size=6)


def _build_xlsx(grid: list[list[str]]) -> bytes:
    rows = []
    for ri, row in enumerate(grid, start=1):
        cells = "".join(
            f'<c r="{chr(65 + ci)}{ri}" t="inlineStr"><is><t>{escape(c)}</t></is></c>'
            for ci, c in enumerate(row)
        )
        rows.append(f'<row r="{ri}">{cells}</row>')
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(rows)}</sheetData></worksheet>"
    )
    wb = (
        '<?xml version="1.0"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="s" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def _build_ods(grid: list[list[str]]) -> bytes:
    rows = []
    for row in grid:
        cells = "".join(
            '<table:table-cell office:value-type="string">'
            f"<text:p>{escape(c)}</text:p></table:table-cell>"
            for c in row
        )
        rows.append(f"<table:table-row>{cells}</table:table-row>")
    content = (
        '<?xml version="1.0"?>'
        "<office:document-content "
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:spreadsheet>"
        f'<table:table table:name="s">{"".join(rows)}</table:table>'
        "</office:spreadsheet></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr("content.xml", content)
    return buf.getvalue()


def _norm_xlsx(row: list[str]) -> list[str]:
    # newlines inside <t> survive; ElementTree normalizes \r\n per XML spec —
    # compare against the XML-normalized expectation
    return [c.replace("\r\n", "\n").replace("\r", "\n") for c in row]


@settings(max_examples=40, deadline=None)
@given(GRID)
def test_xlsx_roundtrip(grid):
    fmt, rows = parse_workbook_rows(_build_xlsx(grid))
    assert fmt == "xlsx"
    assert rows == [_norm_xlsx(r) for r in grid]


@settings(max_examples=40, deadline=None)
@given(GRID)
def test_ods_roundtrip(grid):
    fmt, rows = parse_workbook_rows(_build_ods(grid))
    assert fmt == "ods"
    # the ods parser trims trailing empty cells (repeat-filler defense);
    # ods text:p flattens newlines is NOT done — but XML normalizes \r
    def expect(row):
        out = [c.replace("\r\n", "\n").replace("\r", "\n") for c in row]
        while out and out[-1] == "":
            out.pop()
        return out

    assert rows == [expect(r) for r in grid]
