"""Spreadsheet source (S4): pure-stdlib workbook parsing + the distributed
binaryFile→mapInPandas surface. Mirrors the reference's converter tests
(source/OdsConverterTest.java) plus the table semantics of
OdsConverter.java:86-158: first sheet only, extract-while header, stop at
the first blank row, padded rows, ISO-instant dates."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gbif_data_validator_spark.sources.spreadsheets import (
    conversion_results,
    detect_spreadsheet_format,
    parse_workbook_rows,
    read_spreadsheet_files,
    spreadsheet_table,
    workbook_table,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "spreadsheets")


def _load(name: str) -> bytes:
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


# --- format detection (S2 analog: magic bytes, never the extension) -------


def test_detect_formats():
    assert detect_spreadsheet_format(_load("pages_a.xlsx")) == "xlsx"
    assert detect_spreadsheet_format(_load("pages_b.ods")) == "ods"
    assert detect_spreadsheet_format(_load("pages_c.xml")) == "excel-xml"
    assert detect_spreadsheet_format(_load("broken.xlsx")) == "unsupported"
    assert detect_spreadsheet_format(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1rest") == "xls-legacy"
    assert detect_spreadsheet_format(b"plain text") == "unsupported"


# --- pure parsers ----------------------------------------------------------


def test_xlsx_rows_exact():
    fmt, rows = parse_workbook_rows(_load("pages_a.xlsx"))
    assert fmt == "xlsx"
    # shared strings incl. multi-run, builtin/custom date styles → ISO
    # instants, general numbers, booleans; sheet 2 never appears
    assert rows[0] == ["url", "warc_ts", "text", "lang"]
    assert rows[1] == ["https://example.org/a", "1990-01-02T12:00:00Z", "hello world", "en"]
    assert rows[2] == ["https://example.org/b", "1991-01-01T00:00:00Z", "42", "TRUE"]
    assert rows[3] == []  # the blank row survives in the raw surface
    assert all("MUST NOT APPEAR" not in c for r in rows for c in r)


def test_ods_rows_exact():
    fmt, rows = parse_workbook_rows(_load("pages_b.ods"))
    assert fmt == "ods"
    assert rows[0] == ["url", "warc_ts", "text", "lang"]  # 16380 trailing empties trimmed
    assert rows[1] == ["https://example.org/c", "1990-01-02T00:00:00Z", "dup", "dup"]
    assert rows[2] == ["https://example.org/d", "1991-03-04T05:06:07Z", "2.5", "FALSE"]
    # 1048570 repeated empty rows must be capped, not expanded
    assert len(rows) < 20


def test_excel_xml_rows_exact():
    fmt, rows = parse_workbook_rows(_load("pages_c.xml"))
    assert fmt == "excel-xml"
    assert rows[0] == ["url", "warc_ts", "text", "lang"]
    # ss:Index=4 leaves a gap at column 3
    assert rows[1] == ["https://example.org/e", "1992-05-06T00:00:00.000Z", "", "de"]


def test_workbook_table_reference_semantics():
    for name, n_data in [("pages_a.xlsx", 2), ("pages_b.ods", 2), ("pages_c.xml", 1)]:
        headers, data, n_lines = workbook_table(_load(name))
        assert headers == ["url", "warc_ts", "text", "lang"]
        assert len(data) == n_data and n_lines == 1 + n_data
        assert all(len(r) == 4 for r in data)  # padded to header width
        # stop-at-blank: the row after the blank row is gone
        assert all("after-blank" not in r[0] for r in data)


def test_unsupported_raises():
    with pytest.raises(ValueError, match="unsupported"):
        parse_workbook_rows(_load("broken.xlsx"))


# --- POI-parity edge cases (round-2 hardening) ------------------------------


def test_serial_rounds_to_nearest_second():
    """A time stored as the double just below 1/3 day must print 08:00:00
    (POI's DataFormatter rounds); truncation would print 07:59:59."""
    from gbif_data_validator_spark.sources.spreadsheets import _serial_to_instant

    assert _serial_to_instant(1 / 3).endswith("08:00:00Z")
    assert _serial_to_instant(2 / 3).endswith("16:00:00Z")
    assert _serial_to_instant(61.0) == "1900-03-01T00:00:00Z"


def test_bracketed_format_codes_are_not_date_tokens():
    """'[Red]0.00' contains a literal 'd' inside the color code — POI strips
    bracketed sections before probing, so it must NOT classify as a date."""
    from gbif_data_validator_spark.sources.spreadsheets import _is_date_format

    assert not _is_date_format("[Red]0.00")
    assert not _is_date_format('[$USD-409]#,##0.00')
    assert _is_date_format("[$-409]yyyy-mm-dd")
    assert _is_date_format('yyyy"d"mm')  # quoted literal stripped, ymd remain


def _zip_xlsx(sheet_xml: str, shared_xml: str | None = None) -> bytes:
    import io
    import zipfile

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
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
        if shared_xml is not None:
            zf.writestr("xl/sharedStrings.xml", shared_xml)
    return buf.getvalue()


_SHEET_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'


def test_phonetic_runs_excluded_from_strings():
    """<rPh> furigana guides must not leak into shared or inline values."""
    from gbif_data_validator_spark.sources.spreadsheets import parse_xlsx_rows

    shared = (
        f'<?xml version="1.0"?><sst {_SHEET_NS}>'
        "<si><r><t>東</t></r><r><t>京</t></r>"
        '<rPh sb="0" eb="2"><t>トウキョウ</t></rPh><phoneticPr fontId="1"/></si>'
        "</sst>"
    )
    sheet = (
        f'<?xml version="1.0"?><worksheet {_SHEET_NS}><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="inlineStr"><is><r><t>a</t></r><r><t>b</t></r>'
        '<rPh sb="0" eb="1"><t>NO</t></rPh></is></c></row>'
        "</sheetData></worksheet>"
    )
    rows = list(parse_xlsx_rows(_zip_xlsx(sheet, shared)))
    assert rows == [["東京", "ab"]]


def _zip_ods(table_rows_xml: str) -> bytes:
    import io
    import zipfile

    content = (
        '<?xml version="1.0"?>'
        "<office:document-content "
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:spreadsheet>"
        f'<table:table table:name="s">{table_rows_xml}</table:table>'
        "</office:spreadsheet></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr("content.xml", content)
    return buf.getvalue()


def _ods_cell(val: str | None, rep: int = 1) -> str:
    attr = f' table:number-columns-repeated="{rep}"' if rep != 1 else ""
    body = f'<text:p>{val}</text:p>' if val is not None else ""
    return f'<table:table-cell office:value-type="string"{attr}>{body}</table:table-cell>'


def test_ods_mid_row_gap_preserved_trailing_dropped():
    """A mid-row empty run is a real gap (values must stay under their
    headers); the 16384-wide trailing filler run is dropped, not expanded."""
    from gbif_data_validator_spark.sources.spreadsheets import parse_ods_rows

    row = (
        "<table:table-row>"
        + _ods_cell("a")
        + _ods_cell(None, rep=3)
        + _ods_cell("b")
        + _ods_cell(None, rep=16384)
        + "</table:table-row>"
    )
    (got,) = list(parse_ods_rows(_zip_ods(row)))
    assert got == ["a", "", "", "", "b"]


def test_ods_repeat_bomb_raises():
    """A non-empty cell repeated past the cap is a decompression bomb — it
    must raise (→ per-file error row upstream), never expand."""
    from gbif_data_validator_spark.sources.spreadsheets import parse_ods_rows

    bomb_cells = "<table:table-row>" + _ods_cell("x", rep=100000) + "</table:table-row>"
    with pytest.raises(ValueError, match="bomb"):
        list(parse_ods_rows(_zip_ods(bomb_cells)))
    bomb_rows = (
        '<table:table-row table:number-rows-repeated="100000">'
        + _ods_cell("x")
        + "</table:table-row>"
    )
    with pytest.raises(ValueError, match="bomb"):
        list(parse_ods_rows(_zip_ods(bomb_rows)))
    # mid-row empty run wider than the cap: also a bomb (would expand in full)
    gap_bomb = (
        "<table:table-row>"
        + _ods_cell("a")
        + _ods_cell(None, rep=100000)
        + _ods_cell("b")
        + "</table:table-row>"
    )
    with pytest.raises(ValueError, match="bomb"):
        list(parse_ods_rows(_zip_ods(gap_bomb)))


# --- Spark surface ----------------------------------------------------------


def test_read_spreadsheet_files_rows_and_errors(spark):
    rows = read_spreadsheet_files(spark, FIXTURES).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(os.path.basename(r.src_file), []).append(r)
    assert set(by_file) == {
        "pages_a.xlsx", "pages_b.ods", "pages_c.xml", "pages_d.xls", "broken.xlsx"
    }
    # corrupt file: exactly one error row, no cells — a finding, not a crash
    (err,) = by_file["broken.xlsx"]
    assert err.error and err.cells is None and err.fmt is None
    assert all(r.error is None for r in by_file["pages_a.xlsx"])
    a0 = next(r for r in by_file["pages_a.xlsx"] if r.row_idx == 0)
    assert a0.cells == ["url", "warc_ts", "text", "lang"] and a0.fmt == "xlsx"


def test_spreadsheet_table_unified(spark):
    df = spreadsheet_table(spark, FIXTURES)
    assert df.columns == ["src_file", "src_row", "url", "warc_ts", "text", "lang"]
    got = {
        (r.url, r.warc_ts, r.text, r.lang)
        for r in df.collect()
    }
    assert got == {
        ("https://example.org/a", "1990-01-02T12:00:00Z", "hello world", "en"),
        ("https://example.org/b", "1991-01-01T00:00:00Z", "42", "TRUE"),
        ("https://example.org/c", "1990-01-02T00:00:00Z", "dup", "dup"),
        ("https://example.org/d", "1991-03-04T05:06:07Z", "2.5", "FALSE"),
        ("https://example.org/e", "1992-05-06T00:00:00.000Z", "", "de"),
        ("https://example.org/f", "1990-01-02T12:00:00Z", "99", "fr"),
    }
    # every value is a string — the reference's string-until-interpreted model
    assert all(f.dataType.simpleString() == "string" for f in df.schema.fields[2:])


def test_spreadsheet_table_feeds_validation(spark):
    """The parsed table runs through the standard record-check battery —
    the whole point of the converter (reference: convert → validate CSV)."""
    from gbif_data_validator_spark.operators.record_checks import run_record_checks

    pages = spreadsheet_table(spark, FIXTURES).select(
        "url",
        F.to_timestamp(F.replace(F.col("warc_ts"), F.lit("Z"), F.lit(""))).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        "lang",
    )
    v = run_record_checks(pages, check_extraction=False)
    rows = v.collect()
    assert len(rows) >= 1  # the empty-text excel-xml row is a finding
    assert "TEXT_EMPTY" in {r.check_id for r in rows}


def test_conversion_results(spark):
    res = {os.path.basename(r.src_file): r for r in conversion_results(spark, FIXTURES).collect()}
    assert res["broken.xlsx"].error is not None and res["broken.xlsx"].n_lines == 0
    assert res["pages_a.xlsx"].fmt == "xlsx" and res["pages_a.xlsx"].n_lines == 5
    assert res["pages_c.xml"].fmt == "excel-xml" and res["pages_c.xml"].n_lines == 2
    assert res["pages_d.xls"].fmt == "xls-legacy" and res["pages_d.xls"].n_lines == 4


def test_spreadsheet_table_plan_shape(spark):
    """Only joins allowed are broadcast (the #files cutoff dim)."""
    plan = (
        spreadsheet_table(spark, FIXTURES)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


# --- hardening guards (round-3 ADVICE: bombs must be findings, not OOMs) ----


def test_zip_member_size_cap(monkeypatch):
    """A zip member whose DECLARED decompressed size exceeds the cap is
    rejected before inflation."""
    from gbif_data_validator_spark.sources import spreadsheets as ss

    sheet = (
        f'<?xml version="1.0"?><worksheet {_SHEET_NS}><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>' + "x" * 4096 + "</t></is></c></row>"
        "</sheetData></worksheet>"
    )
    payload = _zip_xlsx(sheet)
    monkeypatch.setattr(ss, "_MAX_XML_MEMBER_BYTES", 1024)
    with pytest.raises(ValueError, match="too large"):
        list(ss.parse_xlsx_rows(payload))


def test_xml_doctype_rejected():
    """DOCTYPE/ENTITY declarations (entity-expansion bombs) are rejected
    outright — no real workbook XML carries a DTD."""
    from gbif_data_validator_spark.sources.spreadsheets import (
        parse_excel_xml_rows,
        parse_xlsx_rows,
    )

    sheet = (
        '<?xml version="1.0"?>'
        '<!DOCTYPE x [<!ENTITY a "aaaa"><!ENTITY b "&a;&a;&a;&a;">]>'
        f"<worksheet {_SHEET_NS}><sheetData>"
        '<row r="1"><c r="A1" t="inlineStr"><is><t>&b;</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    with pytest.raises(ValueError, match="doctype/entity"):
        list(parse_xlsx_rows(_zip_xlsx(sheet)))
    ssml = (
        '<?xml version="1.0"?><!DOCTYPE w [<!ENTITY e "x">]>'
        '<Workbook xmlns:ss="urn:schemas-microsoft-com:office:spreadsheet"/>'
    )
    with pytest.raises(ValueError, match="doctype/entity"):
        list(parse_excel_xml_rows(ssml.encode()))


def test_xlsx_row_gap_capped():
    """One cell parked at r=1048576 yields a handful of blank rows (enough
    for stop-at-blank), never a million."""
    from gbif_data_validator_spark.sources.spreadsheets import (
        _XLSX_EMPTY_GAP_CAP,
        parse_xlsx_rows,
    )

    sheet = (
        f'<?xml version="1.0"?><worksheet {_SHEET_NS}><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row>'
        '<row r="1048576"><c r="A1048576" t="inlineStr"><is><t>tail</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    rows = list(parse_xlsx_rows(_zip_xlsx(sheet)))
    assert rows[0] == ["h"] and rows[-1] == ["tail"]
    assert len(rows) == 2 + _XLSX_EMPTY_GAP_CAP


def test_cell_column_bombs_raise():
    """A crafted column ref ('AAAAAA1') or ss:Index must not trigger an
    unbounded empty-cell fill — raise → per-file error row upstream."""
    from gbif_data_validator_spark.sources.spreadsheets import (
        parse_excel_xml_rows,
        parse_xlsx_rows,
    )

    sheet = (
        f'<?xml version="1.0"?><worksheet {_SHEET_NS}><sheetData>'
        '<row r="1"><c r="AAAAAA1" t="inlineStr"><is><t>x</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    with pytest.raises(ValueError, match="out of range"):
        list(parse_xlsx_rows(_zip_xlsx(sheet)))
    ssml = (
        '<?xml version="1.0"?>'
        '<Workbook xmlns="urn:schemas-microsoft-com:office:spreadsheet" '
        'xmlns:ss="urn:schemas-microsoft-com:office:spreadsheet">'
        "<Worksheet><Table><Row>"
        '<Cell ss:Index="10000000"><Data ss:Type="String">x</Data></Cell>'
        "</Row></Table></Worksheet></Workbook>"
    )
    with pytest.raises(ValueError, match="out of range"):
        list(parse_excel_xml_rows(ssml.encode()))
