"""Minimal stdlib XLSX/ODS readers (zip + XML, no optional deps).

The reference reads spreadsheet sources with ``pandas.read_excel``
(src/morph_kgc/data_source/data_file.py:95-138), which needs openpyxl /
odfpy. Both formats are ZIP archives of XML, and RML spreadsheet sources
are small dimension tables — so a driver-side stdlib parser covers the
same surface without the optional dependencies. Used as the fallback
when pandas' engines are unavailable; numeric cells are coerced like
pandas would (int where lossless, else float) so downstream string
casts produce identical lexical forms.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_SSML = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_TABLE = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_OFFICE = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"

_REL_ID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}Relationship"

_CELL_REF_RE = re.compile(r"([A-Z]+)\d+$")

# caps the grid-padding repeats LibreOffice writes for untouched sheet
# area (16384 cols / 2^20 rows); interior repeated DATA runs this large
# do not occur in dimension tables, and trailing empties are trimmed
_MAX_REPEAT = 4096


def _coerce(v: str):
    """Numeric strings → int/float, matching pandas' read_excel dtypes."""
    try:
        i = int(v)
        return i
    except ValueError:
        try:
            return float(v)
        except ValueError:
            return v


def _col_index(ref: str | None, fallback: int) -> int:
    """'C5' → 2; missing r attribute → positional fallback."""
    if not ref:
        return fallback
    m = _CELL_REF_RE.match(ref)
    if not m:
        return fallback
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _first_sheet_target(z: zipfile.ZipFile) -> str | None:
    """Archive path of the workbook's FIRST sheet (pandas' default).

    Resolved from xl/workbook.xml's sheet order + the workbook rels
    (sheet files are not reliably named by tab order: reordering or
    deleting tabs leaves e.g. sheet3.xml first). Falls back to the
    lexicographically first sheetN.xml when either part is absent.
    """
    try:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        targets = {}
        for rel in rels.iter(_PKG_REL):
            t = rel.get("Target", "")
            targets[rel.get("Id")] = t if t.startswith("/") else f"xl/{t}"
        first = next(wb.iter(f"{_SSML}sheet"), None)
        if first is not None:
            target = targets.get(first.get(_REL_ID), "").lstrip("/")
            if target in z.namelist():
                return target
    except (KeyError, ET.ParseError):
        pass
    names = sorted(n for n in z.namelist()
                   if re.match(r"xl/worksheets/sheet\d+\.xml$", n))
    return names[0] if names else None


def read_xlsx(path: str) -> "pandas.DataFrame":  # noqa: F821
    import pandas as pd

    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_SSML}si"):
                shared.append("".join(t.text or ""
                                      for t in si.iter(f"{_SSML}t")))
        first = _first_sheet_target(z)
        if first is None:
            raise ValueError(f"no worksheets in {path!r}")
        root = ET.fromstring(z.read(first))
        rows: list[list] = []
        for row in root.iter(f"{_SSML}row"):
            out: dict[int, object] = {}
            for pos, c in enumerate(row.findall(f"{_SSML}c")):
                idx = _col_index(c.get("r"), pos)
                ctype = c.get("t", "n")
                if ctype == "inlineStr":
                    is_el = c.find(f"{_SSML}is")
                    val = "".join(t.text or ""
                                  for t in is_el.iter(f"{_SSML}t")) \
                        if is_el is not None else None
                else:
                    v = c.find(f"{_SSML}v")
                    val = v.text if v is not None else None
                    if val is not None:
                        if ctype == "s":
                            val = shared[int(val)]
                        elif ctype == "n":
                            val = _coerce(val)
                        elif ctype == "b":
                            val = bool(int(val))
                out[idx] = val
            width = max(out) + 1 if out else 0
            rows.append([out.get(i) for i in range(width)])
    return _to_frame(rows, pd)


def read_ods(path: str) -> "pandas.DataFrame":  # noqa: F821
    import pandas as pd

    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("content.xml"))
    table = next(root.iter(f"{_TABLE}table"), None)
    if table is None:
        raise ValueError(f"no table in {path!r}")
    rows: list[list] = []
    for row in table.iter(f"{_TABLE}table-row"):
        out: list = []
        for cell in row:
            # covered-table-cell = the shadowed part of a merged range:
            # it still occupies its grid columns, so it must produce a
            # None placeholder (skipping it shifts every later column)
            if cell.tag == f"{_TABLE}covered-table-cell":
                val = None
            elif cell.tag == f"{_TABLE}table-cell":
                vtype = cell.get(f"{_OFFICE}value-type")
                if vtype in ("float", "currency", "percentage"):
                    val = _coerce(cell.get(f"{_OFFICE}value"))
                elif vtype == "boolean":
                    val = cell.get(f"{_OFFICE}boolean-value") == "true"
                elif vtype is None and not list(cell):
                    val = None
                else:
                    val = "\n".join("".join(p.itertext())
                                    for p in cell.findall(f"{_TEXT}p")) or None
            else:
                continue
            repeat = int(cell.get(f"{_TABLE}number-columns-repeated", "1"))
            # interior blank runs must repeat in FULL (values after them
            # belong to later columns); the cap only bounds the huge
            # grid-padding repeats (16384-column sheets), which the
            # trailing-empty trim below removes anyway
            out.extend([val] * min(repeat, _MAX_REPEAT))
        # LibreOffice collapses identical consecutive rows the same way
        # it collapses columns — an un-expanded repeat DROPS data rows
        nrep = min(int(row.get(f"{_TABLE}number-rows-repeated", "1")),
                   _MAX_REPEAT)
        rows.extend(list(out) for _ in range(nrep))
    while rows and all(v is None for v in rows[-1]):
        rows.pop()
    width = max((len(r) for r in rows), default=0)
    rows = [r + [None] * (width - len(r)) for r in rows]
    # grid padding: drop trailing all-empty columns (repeated blank cells)
    while width and all(r[width - 1] is None for r in rows):
        width -= 1
    rows = [r[:width] for r in rows]
    return _to_frame(rows, pd)


def _to_frame(rows: list[list], pd) -> "pandas.DataFrame":  # noqa: F821
    """First row = header (pandas read_excel default)."""
    if not rows:
        return pd.DataFrame()
    header = [str(h) for h in rows[0]]
    return pd.DataFrame(rows[1:], columns=header)
