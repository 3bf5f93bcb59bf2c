"""Excel (.xlsx) boundary without hard dependencies.

The reference exports results with ``DataFrame.to_excel``
(CDCPROJECT notebook nb:1977,1996 — SURVEY.md §2.1 S5) and ingests
sheets with ``pd.read_excel``. This container ships no Excel engine
(openpyxl/xlsxwriter), so this module implements the boundary
directly: an .xlsx file is a zip of OOXML parts, and results at this
boundary are tiny driver-side tables, so a minimal standard-conformant
writer/reader (inline-string cells, one worksheet) covers the
reference's usage exactly. When pandas has an engine available the
public helpers delegate to it; the built-in path is the fallback and
what tests pin.

Only stdlib (zipfile, xml.etree) + pandas at the driver. Never on the
executor path — Excel is an export/ingest boundary, not a scan format
(SURVEY.md §2.1: "callers at scale land raw data as Parquet").
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

_CONTENT_TYPES = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, AB, ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None or (isinstance(value, float) and value != value):
        return ""  # omitted cell = empty
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        # coerce to native Python first: numpy>=2 scalars repr as
        # 'np.float64(1.5)', which would emit unparseable <v> cells
        v = (
            str(int(value))
            if isinstance(value, int)
            else repr(float(value))
        )
        return f'<c r="{ref}"><v>{v}</v></c>'
    text = escape(str(value))
    # xml:space preserve: the reference's Industry column is
    # indentation-encoded — leading spaces are data (SURVEY.md §1.4)
    return (
        f'<c r="{ref}" t="inlineStr">'
        f'<is><t xml:space="preserve">{text}</t></is></c>'
    )


def write_xlsx(pdf: pd.DataFrame, path: str, sheet_name: str = "Sheet1") -> None:
    """Write a pandas DataFrame as a single-sheet .xlsx (header row +
    data rows, inline strings) using only stdlib zip/XML."""
    rows_xml = []
    header = "".join(
        _cell_xml(f"{_col_letter(j)}1", str(c)) for j, c in enumerate(pdf.columns)
    )
    rows_xml.append(f'<row r="1">{header}</row>')
    for i, row in enumerate(pdf.itertuples(index=False), start=2):
        cells = "".join(
            _cell_xml(f"{_col_letter(j)}{i}", v) for j, v in enumerate(row)
        )
        rows_xml.append(f'<row r="{i}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS}"><sheetData>'
        + "".join(rows_xml)
        + "</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS}" xmlns:r="{_REL_NS}"><sheets>'
        f'<sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def _parse_cell(c, shared: list[str]):
    t = c.get("t")
    if t == "inlineStr":
        node = c.find(f"{{{_NS}}}is/{{{_NS}}}t")
        return "" if node is None else (node.text or "")
    v = c.find(f"{{{_NS}}}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return bool(int(v.text))
    if t == "str":
        return v.text
    try:
        return int(v.text)
    except ValueError:
        return float(v.text)


def _sheet_part(z: zipfile.ZipFile, sheet_name: str | None) -> str:
    """Resolve a sheet name to its worksheet part path via
    workbook.xml + its rels (multi-sheet workbooks — reference S1)."""
    if sheet_name is None:
        return "xl/worksheets/sheet1.xml"
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rid = None
    for sheet in wb.iter(f"{{{_NS}}}sheet"):
        if sheet.get("name") == sheet_name:
            rid = sheet.get(f"{{{_REL_NS}}}id")
            break
    if rid is None:
        raise KeyError(f"sheet {sheet_name!r} not found in workbook")
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rel_ns = "http://schemas.openxmlformats.org/package/2006/relationships"
    for rel in rels.iter(f"{{{rel_ns}}}Relationship"):
        if rel.get("Id") == rid:
            target = rel.get("Target")
            return target if target.startswith("xl/") else f"xl/{target}"
    raise KeyError(f"no worksheet relationship for {sheet_name!r}")


def read_xlsx(
    path: str, skiprows: int = 0, sheet_name: str | None = None
) -> pd.DataFrame:
    """Read one sheet of an .xlsx into pandas: first non-skipped row is
    the header. Handles inline strings, shared strings, numbers, and
    booleans — the cell types the writer above and openpyxl emit."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{{{_NS}}}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{{{_NS}}}t")))
        sheet = ET.fromstring(z.read(_sheet_part(z, sheet_name)))
    grid: dict[int, dict[int, object]] = {}
    for row in sheet.iter(f"{{{_NS}}}row"):
        r = int(row.get("r"))
        for c in row.iter(f"{{{_NS}}}c"):
            ref = c.get("r", "")
            letters = re.match(r"[A-Z]+", ref).group()
            j = 0
            for ch in letters:
                j = j * 26 + (ord(ch) - ord("A") + 1)
            grid.setdefault(r, {})[j - 1] = _parse_cell(c, shared)
    if not grid:
        return pd.DataFrame()
    # skiprows counts PHYSICAL sheet rows (pd.read_excel semantics):
    # fully blank rows are absent from the XML but still occupy a row
    # number, so iterate r=1..max, not just the rows present.
    phys_rows = list(range(1, max(grid) + 1))[skiprows:]
    header_cells = grid.get(phys_rows[0], {})
    n_cols = max(max(cells) for cells in grid.values()) + 1
    columns = [header_cells.get(j) for j in range(n_cols)]
    data = [
        [grid.get(r, {}).get(j) for j in range(n_cols)]
        for r in phys_rows[1:]
    ]
    return pd.DataFrame(data, columns=columns)
