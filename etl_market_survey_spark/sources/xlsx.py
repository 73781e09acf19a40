"""Stdlib-only XLSX read/write (VERDICT r4 item 5 — S5/K3 without openpyxl).

XLSX is a zip of XML parts (ECMA-376 / ISO 29500 SpreadsheetML — the
public spec), and the reference only ever uses Excel for TINY dimension
tables (devices_info.py:7 reads one sheet of device metadata;
measurements.py:304 exports a small catalog). That contract makes a
dependency-free ``zipfile`` + ``ElementTree`` implementation the right
fallback: ``pandas.read_excel``/``to_excel`` (openpyxl) remain the
preferred path when installed; this module keeps the S5 reader and K3
sink testable and working in runtimes without it.

Reader coverage: shared strings, inline strings, formula-cached string
cells (t="str"), booleans, numbers, blank cells, sparse rows,
multi-sheet workbooks (by index or name), 1904-date workbooks are NOT
interpreted (dates surface as serial numbers — the dimension tables in
scope carry no dates). Writer: one sheet, numbers/bools/strings
(strings as inline strings, so no sharedStrings part is needed).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _col_index(ref: str) -> int:
    """'A'->0, 'Z'->25, 'AA'->26 ... (cell ref like 'BC12' accepted)."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - 64)
    return n - 1


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _cell_value(cell: ET.Element, shared: list[str]):
    t = cell.get("t", "n")
    if t == "inlineStr":
        is_el = cell.find(f"{_NS}is")
        if is_el is None:
            return None
        return "".join(tn.text or "" for tn in is_el.iter(f"{_NS}t"))
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return v.text.strip() == "1"
    if t == "e":  # error cell -> None (matches pandas' NaN treatment)
        return None
    # numeric: int when integral so dimension keys stay ints
    f = float(v.text)
    return int(f) if f.is_integer() and abs(f) < 2**53 else f


def read_xlsx_rows(path: str, sheet: int | str = 0) -> tuple[list[str], list[list]]:
    """Parse one worksheet into (header, rows). ``sheet`` selects by
    0-based index or by sheet name."""
    with zipfile.ZipFile(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {
            r.get("Id"): r.get("Target") for r in rels.iter(f"{_PKG_REL_NS}Relationship")
        }
        sheets = []
        for s in wb.iter(f"{_NS}sheet"):
            target = rid_to_target[s.get(f"{_REL_NS}id")]
            if not target.startswith("/") and not target.startswith("xl/"):
                target = "xl/" + target
            sheets.append((s.get("name"), target.lstrip("/")))
        if isinstance(sheet, str):
            matches = [t for name, t in sheets if name == sheet]
            if not matches:
                raise KeyError(f"no sheet named {sheet!r} in {path}")
            target = matches[0]
        else:
            target = sheets[sheet][1]

        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            ss = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in ss.iter(f"{_NS}si"):
                shared.append("".join(tn.text or "" for tn in si.iter(f"{_NS}t")))

        ws = ET.fromstring(zf.read(target))
        raw_rows: list[dict[int, object]] = []
        max_col = -1
        for row in ws.iter(f"{_NS}row"):
            cells: dict[int, object] = {}
            auto = 0
            for cell in row.iter(f"{_NS}c"):
                ref = cell.get("r")
                ci = _col_index(ref) if ref else auto
                auto = ci + 1
                cells[ci] = _cell_value(cell, shared)
                max_col = max(max_col, ci)
            raw_rows.append(cells)

    if not raw_rows:
        return [], []
    width = max_col + 1
    dense = [[r.get(i) for i in range(width)] for r in raw_rows]
    header = [str(v) if v is not None else f"col{i}" for i, v in enumerate(dense[0])]
    return header, dense[1:]


def read_xlsx_pandas(path: str, sheet: int | str = 0):
    """(header, rows) -> pandas DataFrame, mirroring pandas.read_excel's
    basic shape (first row = header)."""
    import pandas as pd

    header, rows = read_xlsx_rows(path, sheet)
    return pd.DataFrame(rows, columns=header)


_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets></workbook>'
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _cell_xml(ref: str, v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
    if isinstance(v, (int, float)):
        if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
            return ""  # NaN/inf -> blank, like pandas' default na_rep
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(v))}</t></is></c>'


def write_xlsx(path: str, header: list[str], rows: list[list], sheet_name: str = "Sheet1") -> None:
    """Write one worksheet: header row + data rows, inline strings."""
    body = ["<sheetData>"]
    for ri, row in enumerate([list(header)] + [list(r) for r in rows], start=1):
        cells = "".join(
            _cell_xml(f"{_col_letter(ci)}{ri}", v) for ci, v in enumerate(row)
        )
        body.append(f'<row r="{ri}">{cells}</row>')
    body.append("</sheetData>")
    ws = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        + "".join(body)
        + "</worksheet>"
    )
    safe_name = re.sub(r"[\\/?*\[\]:]", "_", sheet_name)[:31] or "Sheet1"
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK.format(name=escape(safe_name)))
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", ws)
