"""Spreadsheet sources: .xlsx / .ods / Excel-2003-XML workbooks as
DataFrames, closing the reference's S4 converter surface
(source/SpreadsheetConverters.java:35-72, source/OdsConverter.java:49-117).

The reference converts one workbook to a CSV file on local disk (POI/ODF
toolkit), then validates the CSV. Spark-first, the CSV materialization is
pointless: workbooks are scanned with the ``binaryFile`` source and parsed
on executors inside ``mapInPandas`` — 10k sharded workbook files parse in
parallel, each task streaming Arrow batches of ``(src_file, row_idx,
cells)`` rows straight into the same validation passes the CSV would have
fed. Parsing is pure stdlib (``zipfile`` + ``xml.etree``): XLSX and ODS are
zip-of-XML formats, Excel 2003 "SpreadsheetML" is plain XML.

Reference semantics preserved (OdsConverter.java:86-117,120-158):
- first sheet only (multi-sheet workbooks: the rest are ignored),
- header = row-0 cells while non-blank (``extractWhile``),
- data rows stop at the first fully-blank row,
- every data row is padded/truncated to the header width,
- date-typed cells are emitted as ISO-8601 UTC instants
  (``1990-01-02T00:00:00Z``),
- an unparseable workbook is a *finding* (error row), never a crash, and
  per-file conversion stats mirror ``SpreadsheetConversionResult``.

Legacy binary ``.xls`` (BIFF8/CFB) parses via the stdlib reader in
``sources/xls.py`` — all four reference-accepted workbook formats flow
through the same table semantics.

Scale notes: one workbook file is one task input (binaryFile splits at file
granularity); ``spark.sql.files.maxPartitionBytes`` bins small workbooks
many-per-task. The only shuffle in ``spreadsheet_table`` is a tiny per-file
agg (#files rows) that computes each file's blank-row cutoff, re-joined by
broadcast.
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# pure parsing layer (no Spark) — unit-testable, runs inside mapInPandas
# ---------------------------------------------------------------------------

#: decompressed-size cap for any XML member read out of a workbook zip —
#: a sheet/content part bigger than this is a zip bomb; checked against
#: ZipInfo.file_size BEFORE read so the bomb never inflates (zipfile
#: verifies the header size on read, so a lying header also fails)
_MAX_XML_MEMBER_BYTES = 256 * 1024 * 1024
#: DOCTYPE / ENTITY declarations are rejected outright: no real workbook
#: XML carries a DTD, and stdlib expat expands internal entities
#: (billion-laughs) — the declaration itself is the finding
_XML_DTD_RE = re.compile(rb"<!(?:DOCTYPE|ENTITY)", re.IGNORECASE)
#: consecutive empty rows materialized for an xlsx row-index gap (a single
#: cell at r=1048576 must not expand to a million rows; stop-at-blank
#:  semantics only needs one blank row) — mirrors _ODS_EMPTY_REPEAT_CAP
_XLSX_EMPTY_GAP_CAP = 8
#: hard cap on 0-based cell column index (Excel's own max is 16384 cols);
#: a crafted ref like 'AAAAAA1' must not trigger an unbounded gap fill
_MAX_CELL_COL = 16384

_XLSX_EPOCH = datetime(1899, 12, 30, tzinfo=timezone.utc)
#: builtin numFmtIds that render as dates/times (ECMA-376 §18.8.30)
_XLSX_DATE_FMT_IDS = frozenset(range(14, 23)) | frozenset(range(45, 48))
#: date/time tokens in a custom format code, outside quoted literals AND
#: outside bracketed color/locale codes ([Magenta], [$-409]) — POI's
#: isADateFormat strips both before probing
_DATE_TOKEN_RE = re.compile(r'(?:"[^"]*")|(?:\[[^\]]*\])|([ymdhs])', re.IGNORECASE)


def _zip_read(zf: zipfile.ZipFile, name: str) -> bytes:
    """Read a zip member only after its DECLARED decompressed size passes
    the bomb cap; parse failures upstream turn this into an error row."""
    info = zf.getinfo(name)
    if info.file_size > _MAX_XML_MEMBER_BYTES:
        raise ValueError(
            f"zip member too large: {name} ({info.file_size} bytes decompressed)"
        )
    return zf.read(name)


def _parse_xml(data: bytes) -> ElementTree.Element:
    """fromstring with DTD hardening: any DOCTYPE/ENTITY declaration is
    rejected before expat sees it (entity-expansion bombs)."""
    if _XML_DTD_RE.search(data):
        raise ValueError("xml doctype/entity declaration rejected")
    return ElementTree.fromstring(data)


def detect_spreadsheet_format(payload: bytes) -> str:
    """Magic-byte format detection (S2 analog — never trust the extension):
    ``xlsx`` | ``ods`` | ``excel-xml`` | ``xls-legacy`` | ``unsupported``."""
    if payload[:4] == b"PK\x03\x04":
        try:
            with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                names = set(zf.namelist())
        except zipfile.BadZipFile:
            return "unsupported"
        if "xl/workbook.xml" in names:
            return "xlsx"
        if "content.xml" in names:
            if "mimetype" in names:
                with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                    if b"spreadsheet" not in _zip_read(zf, "mimetype"):
                        return "unsupported"
            return "ods"
        return "unsupported"
    if payload[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        return "xls-legacy"  # OLE2/BIFF8 — parsed by sources/xls.py
    head = payload[:512].lstrip()
    if head.startswith(b"<?xml") and b"urn:schemas-microsoft-com:office:spreadsheet" in payload[:2048]:
        return "excel-xml"
    return "unsupported"


def _is_date_format(fmt_code: str) -> bool:
    return any(m.group(1) for m in _DATE_TOKEN_RE.finditer(fmt_code))


def _serial_to_instant(serial: float) -> str:
    """Excel 1900-system serial → ISO instant, rounded to the NEAREST
    second (a time stored as the double just below 1/3 of a day must print
    08:00:00, not 07:59:59 — POI's DataFormatter rounds too). Epoch
    1899-12-30 absorbs the Lotus leap-year bug for serials ≥ 61; sub-61
    serials inherit the historical off-by-one."""
    dt = _XLSX_EPOCH + timedelta(seconds=round(serial * 86400.0))
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def _num_to_str(raw: str) -> str:
    """Canonical numeric rendering: integral floats drop the '.0' (what a
    spreadsheet shows for a general-format integer cell)."""
    try:
        f = float(raw)
    except ValueError:
        return raw
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return repr(f)


def _xlsx_cell_col(ref: str) -> int:
    """'BC23' → 0-based column index 54."""
    col = 0
    for ch in ref:
        if ch.isalpha():
            col = col * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return col - 1


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _rich_text(el: ElementTree.Element) -> str:
    """Cell text from an <si>/<is> element: plain <t> plus run <r><t>
    children ONLY — phonetic guides (<rPh>/<phoneticPr>, furigana in East
    Asian workbooks) must not leak into the value (POI excludes them)."""
    parts: list[str] = []
    for ch in el:
        tag = _local(ch.tag)
        if tag == "t":
            parts.append(ch.text or "")
        elif tag == "r":
            parts.extend(t.text or "" for t in ch if _local(t.tag) == "t")
    return "".join(parts)


def parse_xlsx_rows(payload: bytes) -> Iterator[list[str]]:
    """Yield every raw row of the FIRST sheet as a list of cell strings
    (gaps filled with ``""``). Shared strings, inline strings, booleans,
    numbers, and date-styled numbers (→ ISO instant) are handled."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        names = set(zf.namelist())
        # workbook sheet order → relationship id → worksheet part
        wb = _parse_xml(_zip_read(zf, "xl/workbook.xml"))
        first_rid = None
        for el in wb.iter():
            if _local(el.tag) == "sheet":
                first_rid = next(
                    (v for k, v in el.attrib.items() if _local(k) == "id"), None
                )
                break
        target = "worksheets/sheet1.xml"
        if first_rid and "xl/_rels/workbook.xml.rels" in names:
            rels = _parse_xml(_zip_read(zf, "xl/_rels/workbook.xml.rels"))
            for rel in rels.iter():
                if rel.attrib.get("Id") == first_rid:
                    target = rel.attrib["Target"]
                    break
        sheet_path = target if target.startswith("xl/") else "xl/" + target

        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            ss = _parse_xml(_zip_read(zf, "xl/sharedStrings.xml"))
            shared = [_rich_text(si) for si in ss]

        date_styles: set[int] = set()
        if "xl/styles.xml" in names:
            styles = _parse_xml(_zip_read(zf, "xl/styles.xml"))
            custom_date_ids = {
                int(nf.attrib["numFmtId"])
                for nf in styles.iter()
                if _local(nf.tag) == "numFmt" and _is_date_format(nf.attrib.get("formatCode", ""))
            }
            xf_idx = 0
            for el in styles.iter():
                if _local(el.tag) == "cellXfs":
                    for xf in el:
                        fmt = int(xf.attrib.get("numFmtId", "0"))
                        if fmt in _XLSX_DATE_FMT_IDS or fmt in custom_date_ids:
                            date_styles.add(xf_idx)
                        xf_idx += 1

        sheet = _parse_xml(_zip_read(zf, sheet_path))
        prev_row = 0
        for row in sheet.iter():
            if _local(row.tag) != "row":
                continue
            r = int(row.attrib.get("r", prev_row + 1))
            # skipped (entirely empty) sheet rows — capped: stop-at-blank
            # only needs one blank, and a lone cell parked at r=1048576
            # must not expand into a million rows
            for _ in range(min(r - prev_row - 1, _XLSX_EMPTY_GAP_CAP)):
                yield []
            prev_row = r
            cells: list[str] = []
            next_col = 0
            for c in row:
                if _local(c.tag) != "c":
                    continue
                col = _xlsx_cell_col(c.attrib["r"]) if "r" in c.attrib else next_col
                if col >= _MAX_CELL_COL:
                    raise ValueError(f"cell column out of range: {c.attrib.get('r')}")
                next_col = col + 1
                while len(cells) < col:
                    cells.append("")
                ctype = c.attrib.get("t", "n")
                v_el = next((ch for ch in c if _local(ch.tag) == "v"), None)
                if ctype == "inlineStr":
                    is_el = next((ch for ch in c if _local(ch.tag) == "is"), None)
                    val = _rich_text(is_el) if is_el is not None else ""
                elif v_el is None or v_el.text is None:
                    val = ""
                elif ctype == "s":
                    val = shared[int(v_el.text)]
                elif ctype == "b":
                    val = "TRUE" if v_el.text.strip() == "1" else "FALSE"
                elif ctype == "str" or ctype == "e":
                    val = v_el.text
                else:  # numeric — date-styled numerics become ISO instants
                    if int(c.attrib.get("s", "-1")) in date_styles:
                        val = _serial_to_instant(float(v_el.text))
                    else:
                        val = _num_to_str(v_el.text)
                cells.append(val)
            yield cells


_ODS_NS_TABLE = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_ODS_NS_OFFICE = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
#: consecutive EMPTY repeated rows collapse to this many (trailing filler
#: in real ODS files repeats rows to 1048576; one blank row is all the
#: stop-at-blank semantics needs)
_ODS_EMPTY_REPEAT_CAP = 8
#: a mid-row empty-cell run or a non-empty repeat wider/taller than this is
#: a repeat bomb, surfaced as a parse error (→ error row), never expanded
_ODS_MAX_REPEAT = 16384


def _ods_cell_value(cell: ElementTree.Element) -> str:
    vtype = cell.attrib.get(_ODS_NS_OFFICE + "value-type", "string")
    if vtype == "date":
        # office:date-value is already ISO local — normalize to an instant
        # like the reference (OdsConverter.java:125-134; we pin UTC rather
        # than the system zone so output is deterministic)
        dv = cell.attrib.get(_ODS_NS_OFFICE + "date-value", "")
        if dv and "T" not in dv:
            return dv + "T00:00:00Z"
        return dv + "Z" if dv else ""
    if vtype in ("float", "percentage", "currency"):
        return _num_to_str(cell.attrib.get(_ODS_NS_OFFICE + "value", ""))
    if vtype == "boolean":
        return cell.attrib.get(_ODS_NS_OFFICE + "boolean-value", "").upper()
    return "\n".join(
        "".join(p.itertext()) for p in cell if _local(p.tag) == "p"
    )


def parse_ods_rows(payload: bytes) -> Iterator[list[str]]:
    """Yield every raw row of the FIRST table in content.xml, expanding
    ``number-columns-repeated`` / ``number-rows-repeated``.

    Repeat handling preserves positions: a MID-ROW empty run is a real gap
    and expands in full (values after it must stay under their headers);
    only TRAILING empty runs — the 16384-wide filler real writers emit —
    are dropped, by deferring empty runs until a value follows. A run or
    repeat wider than ``_ODS_MAX_REPEAT`` raises (repeat bomb → error row
    upstream); consecutive repeated EMPTY rows collapse to
    ``_ODS_EMPTY_REPEAT_CAP`` (stop-at-blank needs one)."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        root = _parse_xml(_zip_read(zf, "content.xml"))
    table = next(iter(root.iter(_ODS_NS_TABLE + "table")), None)
    if table is None:
        return
    for row in table.iter(_ODS_NS_TABLE + "table-row"):
        cells: list[str] = []
        pending_empty = 0  # deferred empty run; dropped if nothing follows
        for cell in row:
            if _local(cell.tag) not in ("table-cell", "covered-table-cell"):
                continue
            val = _ods_cell_value(cell) if _local(cell.tag) == "table-cell" else ""
            rep = int(cell.attrib.get(_ODS_NS_TABLE + "number-columns-repeated", "1"))
            if val == "":
                pending_empty += rep
                continue
            if pending_empty > _ODS_MAX_REPEAT or rep > _ODS_MAX_REPEAT:
                raise ValueError("ods column-repeat bomb")
            cells.extend([""] * pending_empty)
            pending_empty = 0
            cells.extend([val] * rep)
        row_rep = int(row.attrib.get(_ODS_NS_TABLE + "number-rows-repeated", "1"))
        if not cells:
            row_rep = min(row_rep, _ODS_EMPTY_REPEAT_CAP)
        elif row_rep > _ODS_MAX_REPEAT:
            raise ValueError("ods row-repeat bomb")
        for _ in range(row_rep):
            yield list(cells)


_SSML_NS = "{urn:schemas-microsoft-com:office:spreadsheet}"


def parse_excel_xml_rows(payload: bytes) -> Iterator[list[str]]:
    """Excel 2003 SpreadsheetML (the convertExcelXmlToCSV path): FIRST
    Worksheet/Table; ``ss:Index`` gaps fill with empty cells; DateTime cells
    pass through their ISO value."""
    root = _parse_xml(payload)
    table = next(iter(root.iter(_SSML_NS + "Table")), None)
    if table is None:
        return
    for row in table.iter(_SSML_NS + "Row"):
        cells: list[str] = []
        for cell in row.iter(_SSML_NS + "Cell"):
            idx = cell.attrib.get(_SSML_NS + "Index")
            if idx is not None:
                if int(idx) > _MAX_CELL_COL:
                    raise ValueError(f"cell index out of range: {idx}")
                while len(cells) < int(idx) - 1:
                    cells.append("")
            data = next(iter(cell.iter(_SSML_NS + "Data")), None)
            if data is None:
                cells.append("")
                continue
            val = "".join(data.itertext())
            if data.attrib.get(_SSML_NS + "Type") == "DateTime" and val and not val.endswith("Z"):
                val += "Z"
            cells.append(val)
        yield cells


def _parse_xls_rows(payload: bytes):
    from .xls import parse_xls_rows  # deferred: avoids a cycle at import

    return parse_xls_rows(payload)


_PARSERS = {
    "xlsx": parse_xlsx_rows,
    "ods": parse_ods_rows,
    "excel-xml": parse_excel_xml_rows,
    "xls-legacy": _parse_xls_rows,
}


def parse_workbook_rows(payload: bytes) -> tuple[str, list[list[str]]]:
    """Detect + parse: returns ``(format, rows)``; unsupported formats raise
    ValueError (callers in the Spark path convert that to an error row)."""
    fmt = detect_spreadsheet_format(bytes(payload))
    parser = _PARSERS.get(fmt)
    if parser is None:
        raise ValueError(f"unsupported spreadsheet format: {fmt}")
    return fmt, list(parser(bytes(payload)))


def workbook_table(payload: bytes) -> tuple[list[str], list[list[str]], int]:
    """Reference table semantics over one workbook
    (OdsConverter.java:86-117): header = row-0 cells while non-blank; data
    until the first fully-blank row, padded/truncated to header width.
    Returns ``(headers, data_rows, n_lines)`` where n_lines counts the
    header like SpreadsheetConversionResult's line count."""
    _, rows = parse_workbook_rows(payload)
    if not rows:
        return [], [], 0
    headers: list[str] = []
    for cell in rows[0]:
        if cell is None or cell.strip() == "":
            break
        headers.append(cell)
    data: list[list[str]] = []
    for raw in rows[1:]:
        line = [(raw[i] if i < len(raw) else "") for i in range(len(headers))]
        if all(c.strip() == "" for c in line):
            break
        data.append(line)
    return headers, data, 1 + len(data)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

ROWS_SCHEMA = T.StructType(
    [
        T.StructField("src_file", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("row_idx", T.LongType()),
        T.StructField("cells", T.ArrayType(T.StringType())),
        T.StructField("error", T.StringType()),
    ]
)


def read_spreadsheet_files(spark: SparkSession, path: str) -> DataFrame:
    """Workbook files → long rows ``(src_file, fmt, row_idx, cells, error)``.
    Each file parses wholly on one executor (binaryFile is file-granular);
    a corrupt or unsupported file yields ONE row with ``error`` set and no
    cells — a finding, not a crash (the reference wraps parser exceptions
    into IOException at SpreadsheetConverters.java:39-41; our contract
    surfaces them as data)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                try:
                    fmt, rows = parse_workbook_rows(content)
                except Exception as exc:  # noqa: BLE001 — any parse failure is a finding
                    out.append((path_, None, None, None, str(exc)[:256]))
                    continue
                for i, cells in enumerate(rows):
                    out.append((path_, fmt, i, cells, None))
            yield pd.DataFrame(out, columns=["src_file", "fmt", "row_idx", "cells", "error"])

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(parse, ROWS_SCHEMA)


def spreadsheet_table(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """Workbook set → one all-string DataFrame under the reference's table
    semantics, distributed: header from the lexicographically-first file's
    row 0 (one bounded driver collect), per-file stop-at-first-blank-row
    cutoffs via a tiny agg (#files rows, broadcast back), rows padded to
    header width. The result feeds the same preflight/record-check passes a
    CSV read would."""
    rows = read_spreadsheet_files(spark, path).where(F.col("error").isNull())

    if columns is None:
        first = (
            rows.where(F.col("row_idx") == 0)
            .orderBy("src_file")
            .select("cells")
            .head(1)
        )
        if not first:
            raise ValueError(f"no parseable workbook rows under {path}")
        columns = []
        for cell in first[0][0]:
            if cell is None or cell.strip() == "":
                break
            columns.append(cell)
        if not columns:
            raise ValueError(f"blank header row in first workbook under {path}")

    # F.get (not []): ANSI mode makes [i] throw on short/empty rows — a
    # padded blank cell must come back NULL→"" instead
    blank = F.lit(True)
    for i in range(len(columns)):
        blank = blank & (F.trim(F.coalesce(F.get(F.col("cells"), i), F.lit(""))) == "")
    cutoff = (
        rows.where((F.col("row_idx") > 0) & blank)
        .groupBy("src_file")
        .agg(F.min("row_idx").alias("_cutoff"))
    )
    kept = (
        rows.where(F.col("row_idx") > 0)
        .join(F.broadcast(cutoff), "src_file", "left")
        .where(F.col("_cutoff").isNull() | (F.col("row_idx") < F.col("_cutoff")))
    )
    return kept.select(
        "src_file",
        F.col("row_idx").alias("src_row"),
        *[
            F.coalesce(F.get(F.col("cells"), i), F.lit("")).alias(name)
            for i, name in enumerate(columns)
        ],
    )


def conversion_results(spark: SparkSession, path: str) -> DataFrame:
    """Per-file conversion stats mirroring SpreadsheetConversionResult
    (source/SpreadsheetConversionResult.java): source file, detected format,
    raw line count from the first sheet, and the error for files that
    failed to parse (the reference's header+data count after blank-row
    truncation is `workbook_table`'s third return)."""
    rows = read_spreadsheet_files(spark, path)
    return rows.groupBy("src_file").agg(
        F.max("fmt").alias("fmt"),
        F.count(F.col("row_idx")).alias("n_lines"),
        F.max("error").alias("error"),
    )
