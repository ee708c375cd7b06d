"""Shared records -> Arrow table conversion for the schemaless readers
(json/yaml/xml/avro). One implementation so the mixed-type fallback
cannot drift between formats (review r4: xml had the fallback, the other
three copies crashed on the same input)."""

from __future__ import annotations

from typing import Any

import pyarrow as pa


def records_to_table(records: list[Any]) -> pa.Table:
    # root-wrap non-dict records (InferAvroSchema.java:121-129)
    if records and not isinstance(records[0], dict):
        records = [{"value": r} for r in records]
    try:
        return pa.Table.from_pylist(records)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        # per-cell scalar typing (org.json convention) can infer MIXED types
        # within one column ("0" -> int, ":" -> str); the reference's
        # schemaless ION rows tolerate that, an Arrow column cannot —
        # stringify the offending columns instead of crashing the read
        keys: list[str] = []
        for r in records:
            keys += [k for k in r if k not in keys]
        cols: dict[str, list] = {k: [r.get(k) for r in records] for k in keys}
        arrays = {}
        for k, vals in cols.items():
            try:
                arrays[k] = pa.array(vals)
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                arrays[k] = pa.array(
                    [None if v is None else str(v) for v in vals],
                    type=pa.string())
        return pa.table(arrays)
