"""From-scratch, stdlib-only XLSX writer (closes the last S9 exclusion).

XLSX is a ZIP of XML parts (ECMA-376 / ISO 29500 SpreadsheetML — a
public format): [Content_Types].xml, the package rels, a workbook, one
worksheet with inline strings, and a style part.  This writer emits the
minimal conforming set plus the two styles the reference report needs
(eval.py:201-239 via pandas Styler): a bold header row and bold
highlighting of the per-column maximum among numeric cells.

No third-party package is involved on either the write side (zipfile +
hand-built XML) or the verify side (tests unzip and parse the parts
with ElementTree).
"""

from __future__ import annotations

import math
import zipfile
from xml.sax.saxutils import escape

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
    'worksheet+xml"/>'
    '<Override PartName="/xl/styles.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
    '2006/main" xmlns:r="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships">'
    '<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets>'
    "</workbook>"
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" '
    'Target="worksheets/sheet1.xml"/>'
    '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/styles" Target="styles.xml"/>'
    "</Relationships>"
)

# style indices: 0 = default, 1 = bold (header + highlighted max)
_STYLES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
    '2006/main">'
    '<fonts count="2"><font><sz val="11"/><name val="Calibri"/></font>'
    '<font><b/><sz val="11"/><name val="Calibri"/></font></fonts>'
    '<fills count="2"><fill><patternFill patternType="none"/></fill>'
    '<fill><patternFill patternType="gray125"/></fill></fills>'
    '<borders count="1"><border/></borders>'
    '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
    '<cellXfs count="2"><xf xfId="0"/>'
    '<xf xfId="0" fontId="1" applyFont="1"/></cellXfs>'
    "</styleSheet>"
)

BOLD_STYLE = 1


def column_ref(idx: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, AB, ..."""
    ref = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        ref = chr(ord("A") + rem) + ref
    return ref


def _cell_xml(row: int, col: int, value, bold: bool) -> str:
    ref = f"{column_ref(col)}{row}"
    style = f' s="{BOLD_STYLE}"' if bold else ""
    if value is None:
        return f'<c r="{ref}"{style}/>'
    if isinstance(value, bool):
        return f'<c r="{ref}"{style} t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        if isinstance(value, float) and not math.isfinite(value):
            # NaN/inf are not valid SpreadsheetML numbers; emit the repr
            # as an inline string so the workbook stays well-formed.
            return (
                f'<c r="{ref}"{style} t="inlineStr"><is><t>'
                f"{escape(repr(value))}</t></is></c>"
            )
        return f'<c r="{ref}"{style}><v>{value!r}</v></c>'
    return (
        f'<c r="{ref}"{style} t="inlineStr"><is><t xml:space="preserve">'
        f"{escape(str(value))}</t></is></c>"
    )


def write_xlsx(path: str, cols: list[str], rows: list[list],
               sheet_name: str = "metrics",
               highlight_max: bool = True) -> str:
    """Write a single-sheet XLSX: bold header, and (like the reference's
    pandas-Styler export) the per-column maximum among numeric cells in
    bold.  Returns ``path``."""
    n_cols = len(cols)
    maxima: dict[int, float] = {}
    if highlight_max:
        for row in rows:
            for j in range(n_cols):
                v = row[j] if j < len(row) else None
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    if j not in maxima or v > maxima[j]:
                        maxima[j] = v

    body = ['<row r="1">']
    body += [_cell_xml(1, j, cols[j], bold=True) for j in range(n_cols)]
    body.append("</row>")
    for i, row in enumerate(rows):
        r = i + 2
        body.append(f'<row r="{r}">')
        for j in range(n_cols):
            v = row[j] if j < len(row) else None
            bold = (
                highlight_max
                and isinstance(v, (int, float))
                and not isinstance(v, bool)
                and j in maxima
                and v >= maxima[j]
            )
            body.append(_cell_xml(r, j, v, bold))
        body.append("</row>")

    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(body)
        + "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr(
            "xl/workbook.xml",
            _WORKBOOK.format(name=escape(sheet_name[:31] or "Sheet1")),
        )
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        zf.writestr("xl/styles.xml", _STYLES)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return path
