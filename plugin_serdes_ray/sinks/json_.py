"""Dataset/Table -> JSON, reproducing IonToJson
(/root/reference json/IonToJson.java:82-467):

- JSONL (default) or single JSON array (:126-127)
- timestamps -> zoned ISO strings with a configurable time_zone_id
  (:391-397)
- bytes -> base64 strings (JSON has no binary type)
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
