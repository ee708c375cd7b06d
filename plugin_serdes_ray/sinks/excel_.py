"""Dataset/Table -> .xlsx, reproducing IonToExcel
(/root/reference excel/IonToExcel.java:112-344) without openpyxl: write the
ECMA-376 ZIP parts directly (stdlib zipfile + escaped XML).

Mirrored: single sheet or map-of-sheets input (:159-187); typed cells for
Number/Boolean/Date/Datetime (:255-322; dates emitted as ISO strings, the
UNFORMATTED date_time_render); ``Formula:`` prefix -> formula cell
(:313-316). Strings are inline (no shared-strings table) — the streaming
SXSSF analog (one pass, no cell cache).
"""

from __future__ import annotations

import datetime
import io
import zipfile
from decimal import Decimal
from typing import Any
from xml.sax.saxutils import escape

import pyarrow as pa

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _col_name(i: int) -> str:
    name = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        name = chr(65 + rem) + name
    return name


def _cell_xml(ref: str, v: Any) -> str:
    if v is None:
        return ""
    if isinstance(v, str) and v.startswith("Formula:"):  # :313-316
        return f'<c r="{ref}"><f>{escape(v[len("Formula:"):])}</f></c>'
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return f'<c r="{ref}"><v>{v}</v></c>'
    if isinstance(v, Decimal):
        return f'<c r="{ref}"><v>{v}</v></c>'
    if isinstance(v, (datetime.datetime, datetime.date, datetime.time)):
        v = v.isoformat()  # UNFORMATTED render (:295-314)
    s = escape(str(v))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{s}</t></is></c>'


def _sheet_xml(table: pa.Table, header: bool = True) -> str:
    out = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
           '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">',
           "<sheetData>"]
    names = table.column_names
    r = 1
    if header:
        cells = "".join(_cell_xml(f"{_col_name(i)}{r}", n)
                        for i, n in enumerate(names))
        out.append(f'<row r="{r}">{cells}</row>')
        r += 1
    cols = [table.column(n).to_pylist() for n in names]
    for row_i in range(table.num_rows):
        cells = "".join(_cell_xml(f"{_col_name(i)}{r}", cols[i][row_i])
                        for i in range(len(names)))
        out.append(f'<row r="{r}">{cells}</row>')
        r += 1
    out.append("</sheetData></worksheet>")
    return "".join(out)


def tables_to_xlsx_bytes(sheets: dict[str, pa.Table], header: bool = True) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        names = list(sheets)
        overrides = "\n".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            f'ContentType="application/vnd.openxmlformats-officedocument.'
            f'spreadsheetml.worksheet+xml"/>'
            for i in range(len(names)))
        zf.writestr("[Content_Types].xml",
                    _CONTENT_TYPES.format(sheet_overrides=overrides))
        zf.writestr("_rels/.rels", _ROOT_RELS)
        sheet_tags = "".join(
            # escape() alone leaves '"' intact — inside a double-quoted
            # attribute that breaks workbook.xml well-formedness
            f'<sheet name="{escape(n, {chr(34): "&quot;"})}" '
            f'sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names))
        zf.writestr("xl/workbook.xml",
                    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
                    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
                    f"<sheets>{sheet_tags}</sheets></workbook>")
        rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names)))
        zf.writestr("xl/_rels/workbook.xml.rels",
                    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                    f"{rels}</Relationships>")
        for i, n in enumerate(names):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml",
                        _sheet_xml(sheets[n], header))
    return buf.getvalue()


def write_excel(ds_or_sheets, path: str, sheet_name: str = "Sheet1",
                header: bool = True) -> int:
    """Dataset -> one-sheet xlsx, or {name: Dataset/Table} -> multi-sheet."""
    if isinstance(ds_or_sheets, dict):
        sheets = {}
        rows = 0
        for name, ds in ds_or_sheets.items():
            t = ds if isinstance(ds, pa.Table) else _collect(ds)
            sheets[name] = t
            rows += t.num_rows
    else:
        t = ds_or_sheets if isinstance(ds_or_sheets, pa.Table) else _collect(ds_or_sheets)
        sheets = {sheet_name: t}
        rows = t.num_rows
    with open(path, "wb") as f:
        f.write(tables_to_xlsx_bytes(sheets, header))
    return rows


def _collect(ds) -> pa.Table:
    tables = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
              for b in ds.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables(tables) if tables else pa.table({})
