"""Dataset/Table -> JSON, reproducing IonToJson
(/root/reference json/IonToJson.java:82-467):

- JSONL (default) or single JSON array (:126-127)
- timestamps -> zoned ISO strings with a configurable time_zone_id
  (:391-397)
- bytes -> base64 strings (JSON has no binary type)
- annotation preservation (shouldKeepAnnotations, :120,306-434): Arrow
  has no ION type annotations, so the carrier here is a struct value of
  exactly ``{ion_annotations: list<string>, value: ...}`` (what
  ``sources/json_.keep_annotations`` produces). ``keep_annotations=True``
  re-emits the ``{"ion_annotations": [...], "value": ...}`` wrapper when
  the list is non-empty (the reference wraps only annotated values,
  IonToJson.java:318-331); the default drops annotations and writes the
  bare value, matching the reference default.
"""

from __future__ import annotations

import base64
import datetime
import json
from dataclasses import dataclass
from decimal import Decimal
from typing import Any, Optional
from zoneinfo import ZoneInfo

import pyarrow as pa


@dataclass
class JsonWriteOptions:
    newline_delimited: bool = True
    time_zone_id: str = "UTC"
    charset: str = "utf-8"
    keep_annotations: bool = False


def is_annotation_wrapper(v: Any) -> bool:
    """An annotation-carrier value: dict of exactly
    {ion_annotations: [str...] | None, value: anything}."""
    return (isinstance(v, dict) and set(v) == {"ion_annotations", "value"}
            and isinstance(v.get("ion_annotations"), (list, type(None)))
            and all(isinstance(a, str)
                    for a in (v.get("ion_annotations") or ())))


def _apply_annotations(o: Any, keep: bool) -> Any:
    """Resolve annotation carriers: keep=True re-wraps (only when
    annotations exist), keep=False writes the bare value."""
    if isinstance(o, dict):
        if is_annotation_wrapper(o):
            anns = o.get("ion_annotations") or []
            val = _apply_annotations(o["value"], keep)
            if keep and anns:
                return {"ion_annotations": list(anns), "value": val}
            return val
        return {k: _apply_annotations(v, keep) for k, v in o.items()}
    if isinstance(o, list):
        return [_apply_annotations(v, keep) for v in o]
    return o


def _type_has_annotations(t: pa.DataType) -> bool:
    if pa.types.is_struct(t):
        names = {t.field(i).name for i in range(t.num_fields)}
        if names == {"ion_annotations", "value"}:
            return True
        return any(_type_has_annotations(t.field(i).type)
                   for i in range(t.num_fields))
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _type_has_annotations(t.value_type)
    if pa.types.is_map(t):
        return (_type_has_annotations(t.key_type)
                or _type_has_annotations(t.item_type))
    return False


def _default(o: Any, tz: str) -> Any:
    if isinstance(o, datetime.datetime):
        if o.tzinfo is None:
            o = o.replace(tzinfo=datetime.timezone.utc)
        return o.astimezone(ZoneInfo(tz)).isoformat()
    if isinstance(o, (datetime.date, datetime.time)):
        return o.isoformat()
    if isinstance(o, Decimal):
        return str(o)
    if isinstance(o, (bytes, bytearray)):
        return base64.b64encode(bytes(o)).decode()
    raise TypeError(type(o))


def table_to_json_bytes(table: pa.Table, opts: Optional[JsonWriteOptions] = None) -> bytes:
    opts = opts or JsonWriteOptions()
    records = table.to_pylist()
    # annotation carriers resolve only when the schema actually has a
    # {ion_annotations, value} struct somewhere — no per-row scan otherwise
    if any(_type_has_annotations(f.type) for f in table.schema):
        records = [_apply_annotations(r, opts.keep_annotations)
                   for r in records]
    dump = lambda r: json.dumps(r, separators=(",", ":"), ensure_ascii=False,
                                default=lambda o: _default(o, opts.time_zone_id))
    if opts.newline_delimited:
        return ("\n".join(dump(r) for r in records) + ("\n" if records else "")).encode(opts.charset)
    return ("[" + ",".join(dump(r) for r in records) + "]").encode(opts.charset)


def write_json(ds, path: str, opts: Optional[JsonWriteOptions] = None) -> int:
    opts = opts or JsonWriteOptions()
    rows = 0
    with open(path, "wb") as f:
        if not opts.newline_delimited:
            f.write(b"[")
        first = True
        for batch in ds.iter_batches(batch_format="pyarrow"):
            t = pa.Table.from_batches([batch]) if isinstance(batch, pa.RecordBatch) else batch
            payload = table_to_json_bytes(
                t, JsonWriteOptions(**{**opts.__dict__, "newline_delimited": True}))
            if opts.newline_delimited:
                f.write(payload)
            else:
                # split on '\n' ONLY — str.splitlines() also splits on
                # U+2028/U+2029/U+0085, which ensure_ascii=False leaves
                # unescaped inside JSON strings, corrupting records
                items = payload.decode(opts.charset).split("\n")
                items = [it for it in items if it]
                for it in items:
                    if not first:
                        f.write(b",")
                    f.write(it.encode(opts.charset))
                    first = False
            rows += t.num_rows
        if not opts.newline_delimited:
            f.write(b"]")
    return rows
