"""Generate deterministic spreadsheet fixtures (pure stdlib — xlsx/ods are
zip+XML, Excel 2003 is plain XML). Committed outputs live in
tests/fixtures/spreadsheets/; rerun this script if the expected content
changes. Zip entry timestamps are pinned so the bytes are reproducible.

Fixture content exercises the reference semantics the parser must honor
(source/OdsConverter.java:86-158): non-blank header prefix, a blank data
row that truncates the table, short rows padded to header width, date-typed
cells rendered as ISO instants, shared vs inline strings (xlsx),
number-columns-repeated (ods), and ss:Index gaps (excel-xml).
"""

from __future__ import annotations

import os
import zipfile

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "spreadsheets")

_ZERO_TS = (1980, 1, 1, 0, 0, 0)


def _zipw(path: str, members: list[tuple[str, bytes]]) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members:
            zi = zipfile.ZipInfo(name, date_time=_ZERO_TS)
            zi.external_attr = 0o600 << 16
            zf.writestr(zi, data)


def make_xlsx(path: str) -> None:
    content_types = b"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
</Types>"""
    root_rels = b"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""
    workbook = b"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="pages" sheetId="1" r:id="rId1"/><sheet name="ignored" sheetId="2" r:id="rId2"/></sheets>
</workbook>"""
    wb_rels = b"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""
    shared = b"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="7" uniqueCount="7">
<si><t>url</t></si><si><t>warc_ts</t></si><si><t>text</t></si><si><t>lang</t></si>
<si><t>https://example.org/a</t></si><si><r><t>hello </t></r><r><t>world</t></r></si><si><t>en</t></si>
</sst>"""
    # style 0: general; style 1: builtin date numFmt 14; style 2: custom date fmt
    styles = b"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy-mm-dd hh:mm"/></numFmts>
<cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="164"/></cellXfs>
</styleSheet>"""
    # row1 header; row2: shared strings + date style; row3: inline string,
    # custom-date style, number, boolean; row4 blank-ish (truncates);
    # row5 after blank must be dropped by table semantics
    sheet1 = b"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c></row>
<row r="2"><c r="A2" t="s"><v>4</v></c><c r="B2" s="1"><v>32875.5</v></c><c r="C2" t="s"><v>5</v></c><c r="D2" t="s"><v>6</v></c></row>
<row r="3"><c r="A3" t="inlineStr"><is><t>https://example.org/b</t></is></c><c r="B3" s="2"><v>33239</v></c><c r="C3"><v>42</v></c><c r="D3" t="b"><v>1</v></c></row>
<row r="4"/>
<row r="5"><c r="A5" t="inlineStr"><is><t>https://example.org/after-blank</t></is></c></row>
</sheetData>
</worksheet>"""
    sheet2 = b"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>MUST NOT APPEAR</t></is></c></row></sheetData>
</worksheet>"""
    _zipw(
        path,
        [
            ("[Content_Types].xml", content_types),
            ("_rels/.rels", root_rels),
            ("xl/workbook.xml", workbook),
            ("xl/_rels/workbook.xml.rels", wb_rels),
            ("xl/sharedStrings.xml", shared),
            ("xl/styles.xml", styles),
            ("xl/worksheets/sheet1.xml", sheet1),
            ("xl/worksheets/sheet2.xml", sheet2),
        ],
    )


def make_ods(path: str) -> None:
    mimetype = b"application/vnd.oasis.opendocument.spreadsheet"
    manifest = b"""<?xml version="1.0" encoding="UTF-8"?>
<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0">
<manifest:file-entry manifest:full-path="/" manifest:media-type="application/vnd.oasis.opendocument.spreadsheet"/>
<manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>
</manifest:manifest>"""
    content = b"""<?xml version="1.0" encoding="UTF-8"?>
<office:document-content
 xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
 xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"
 xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
<office:body><office:spreadsheet>
<table:table table:name="pages">
<table:table-row>
<table:table-cell office:value-type="string"><text:p>url</text:p></table:table-cell>
<table:table-cell office:value-type="string"><text:p>warc_ts</text:p></table:table-cell>
<table:table-cell office:value-type="string"><text:p>text</text:p></table:table-cell>
<table:table-cell office:value-type="string"><text:p>lang</text:p></table:table-cell>
<table:table-cell table:number-columns-repeated="16380"/>
</table:table-row>
<table:table-row>
<table:table-cell office:value-type="string"><text:p>https://example.org/c</text:p></table:table-cell>
<table:table-cell office:value-type="date" office:date-value="1990-01-02"><text:p>01/02/90</text:p></table:table-cell>
<table:table-cell table:number-columns-repeated="2" office:value-type="string"><text:p>dup</text:p></table:table-cell>
</table:table-row>
<table:table-row>
<table:table-cell office:value-type="string"><text:p>https://example.org/d</text:p></table:table-cell>
<table:table-cell office:value-type="date" office:date-value="1991-03-04T05:06:07"><text:p>x</text:p></table:table-cell>
<table:table-cell office:value-type="float" office:value="2.5"><text:p>2.5</text:p></table:table-cell>
<table:table-cell office:value-type="boolean" office:boolean-value="false"><text:p>FALSE</text:p></table:table-cell>
</table:table-row>
<table:table-row table:number-rows-repeated="1048570"/>
<table:table-row>
<table:table-cell office:value-type="string"><text:p>after-blank</text:p></table:table-cell>
</table:table-row>
</table:table>
<table:table table:name="ignored">
<table:table-row><table:table-cell office:value-type="string"><text:p>MUST NOT APPEAR</text:p></table:table-cell></table:table-row>
</table:table>
</office:spreadsheet></office:body>
</office:document-content>"""
    _zipw(path, [("mimetype", mimetype), ("META-INF/manifest.xml", manifest), ("content.xml", content)])


def make_excel_xml(path: str) -> None:
    doc = b"""<?xml version="1.0"?>
<Workbook xmlns="urn:schemas-microsoft-com:office:spreadsheet"
 xmlns:ss="urn:schemas-microsoft-com:office:spreadsheet">
<Worksheet ss:Name="pages"><Table>
<Row><Cell><Data ss:Type="String">url</Data></Cell><Cell><Data ss:Type="String">warc_ts</Data></Cell><Cell><Data ss:Type="String">text</Data></Cell><Cell><Data ss:Type="String">lang</Data></Cell></Row>
<Row><Cell><Data ss:Type="String">https://example.org/e</Data></Cell><Cell><Data ss:Type="DateTime">1992-05-06T00:00:00.000</Data></Cell><Cell ss:Index="4"><Data ss:Type="String">de</Data></Cell></Row>
</Table></Worksheet>
<Worksheet ss:Name="ignored"><Table>
<Row><Cell><Data ss:Type="String">MUST NOT APPEAR</Data></Cell></Row>
</Table></Worksheet>
</Workbook>"""
    with open(path, "wb") as f:
        f.write(doc)


def make_xls(path: str) -> None:
    """Minimal BIFF8-in-CFB workbook (pure stdlib, byte-deterministic).
    The Workbook stream carries the record set sources/xls.py reads —
    BOF/DATEMODE/FORMAT/XF/BOUNDSHEET/SST in the globals substream,
    LABELSST/NUMBER/RK cells in the sheet — and is zero-padded past the
    4096-byte mini-stream cutoff so the regular FAT path serves it (the
    padding sits after the final EOF record, which no reader touches).
    The reader itself is validated against a real Excel-written fixture
    (the reference's occurrence-workbook.xls) so writer and reader bugs
    can't cancel out."""
    import struct

    def rec(opcode: int, data: bytes) -> bytes:
        return struct.pack("<HH", opcode, len(data)) + data

    def xf(ifmt: int) -> bytes:
        body = bytearray(20)
        struct.pack_into("<H", body, 2, ifmt)
        return rec(0x00E0, bytes(body))

    sst_strings = [
        "url", "warc_ts", "text", "lang",
        "https://example.org/f", "fr", "https://example.org/after-blank",
    ]
    sst_body = struct.pack("<II", len(sst_strings), len(sst_strings))
    for s in sst_strings:
        sst_body += struct.pack("<HB", len(s), 0) + s.encode("latin-1")

    fmt_code = "yyyy-mm-dd hh:mm"
    bof_globals = rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    bof_sheet = rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))

    def labelsst(row: int, col: int, isst: int, ixfe: int = 0) -> bytes:
        return rec(0x00FD, struct.pack("<HHHI", row, col, ixfe, isst))

    sheet = bof_sheet
    for c in range(4):  # header row from SST
        sheet += labelsst(0, c, c)
    sheet += labelsst(1, 0, 4)
    # B2: date-styled NUMBER (ixfe 1 → builtin fmt 14): serial 32875.5
    sheet += rec(0x0203, struct.pack("<HHHd", 1, 1, 1, 32875.5))
    # C2: RK integer 99 (fInt flag set)
    sheet += rec(0x027E, struct.pack("<HHHI", 1, 2, 0, (99 << 2) | 0x02))
    sheet += labelsst(1, 3, 5)
    # row 2 blank (no records); row 3 must fall to stop-at-blank upstream
    sheet += labelsst(3, 0, 6)
    sheet += rec(0x000A, b"")

    # globals need the sheet's stream offset → assemble in two passes
    def globals_part(ply_pos: int) -> bytes:
        name = b"pages"
        return (
            bof_globals
            + rec(0x0022, struct.pack("<H", 0))  # DATEMODE 1900
            + rec(
                0x041E,
                struct.pack("<HHB", 164, len(fmt_code), 0) + fmt_code.encode(),
            )
            + xf(0) + xf(14) + xf(164)
            + rec(0x0085, struct.pack("<IHB", ply_pos, 0, len(name)) + b"\x00" + name)
            + rec(0x00FC, sst_body)
            + rec(0x000A, b"")
        )

    ply = len(globals_part(0))
    stream = globals_part(ply) + sheet
    stream += b"\x00" * max(0, 4096 + 1 - len(stream))  # past the mini cutoff

    # --- CFB container: sector 0 = FAT, sector 1 = directory, 2.. = stream
    sec = 512
    n_stream_secs = -(-len(stream) // sec)
    FREE, END, FATSECT = 0xFFFFFFFF, 0xFFFFFFFE, 0xFFFFFFFD
    fat = [FATSECT, END] + [2 + i + 1 for i in range(n_stream_secs - 1)] + [END]
    fat += [FREE] * (sec // 4 - len(fat))
    fat_sector = struct.pack(f"<{sec // 4}I", *fat)

    def dirent(name: str, typ: int, start: int, size: int, child: int) -> bytes:
        raw = name.encode("utf-16-le")
        e = bytearray(128)
        e[0 : len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw) + 2)
        e[66] = typ
        e[67] = 1  # black
        struct.pack_into("<iii", e, 68, -1, -1, child)
        struct.pack_into("<II", e, 116, start, size)
        return bytes(e)

    directory = (
        dirent("Root Entry", 5, END, 0, 1)
        + dirent("Workbook", 2, 2, len(stream), -1)
        + bytes(128) * 2
    )

    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<HHHHH", header, 24, 0x003E, 0x0003, 0xFFFE, 9, 6)
    struct.pack_into("<I", header, 44, 1)  # one FAT sector
    struct.pack_into("<I", header, 48, 1)  # directory starts at sector 1
    struct.pack_into("<I", header, 56, 4096)  # mini cutoff
    struct.pack_into("<II", header, 60, END, 0)  # no miniFAT
    struct.pack_into("<II", header, 68, END, 0)  # no DIFAT sectors
    struct.pack_into("<109I", header, 76, 0, *([FREE] * 108))

    body = fat_sector + directory + stream
    body += b"\x00" * (-len(body) % sec)
    with open(path, "wb") as f:
        f.write(bytes(header) + body)


def make_corrupt(path: str) -> None:
    with open(path, "wb") as f:
        f.write(b"PK\x03\x04 this is not really a zip archive")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    make_xlsx(os.path.join(OUT, "pages_a.xlsx"))
    make_ods(os.path.join(OUT, "pages_b.ods"))
    make_excel_xml(os.path.join(OUT, "pages_c.xml"))
    make_xls(os.path.join(OUT, "pages_d.xls"))
    make_corrupt(os.path.join(OUT, "broken.xlsx"))
    print("wrote fixtures to", os.path.abspath(OUT))


if __name__ == "__main__":
    main()
