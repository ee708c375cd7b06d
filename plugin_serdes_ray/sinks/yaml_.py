"""Dataset/Table -> YAML, reproducing IonToYaml
(/root/reference yaml/IonToYaml.java:66-140): one record -> plain YAML doc,
N records -> ``---``-separated multi-doc stream (:99-120). Also JsonToYaml
(yaml/JsonToYaml.java:99-201).
"""

from __future__ import annotations

import datetime
import json
from decimal import Decimal
from typing import Any, Optional

import pyarrow as pa
import yaml


def _plain(o: Any) -> Any:
    if isinstance(o, dict):
        return {k: _plain(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [_plain(v) for v in o]
    if isinstance(o, (datetime.datetime, datetime.date, datetime.time)):
        return o.isoformat()
    if isinstance(o, Decimal):
        return str(o)
    if isinstance(o, (bytes, bytearray)):
        return bytes(o).decode("utf-8", "replace")
    return o


def records_to_yaml(records: list[Any]) -> str:
    docs = [_plain(r) for r in records]
    if len(docs) == 1:
        return yaml.safe_dump(docs[0], sort_keys=False, allow_unicode=True)
    return yaml.safe_dump_all(docs, sort_keys=False, allow_unicode=True,
                              explicit_start=True)


def table_to_yaml_bytes(table: pa.Table, charset: str = "utf-8") -> bytes:
    return records_to_yaml(table.to_pylist()).encode(charset)


def write_yaml(ds, path: str, charset: str = "utf-8") -> int:
    """Dataset -> YAML file, streamed batch-by-batch (never the whole
    dataset in driver memory). Multi-doc docs concatenate identically to
    ``safe_dump_all(explicit_start=True)``; only the single-record
    plain-doc special case needs a one-record lookahead buffer."""
    def dump(r: Any) -> bytes:
        return yaml.safe_dump_all(
            [_plain(r)], sort_keys=False, allow_unicode=True,
            explicit_start=True).encode(charset)

    rows = 0
    pending: Any = None
    with open(path, "wb") as f:
        for batch in ds.iter_batches(batch_format="pyarrow"):
            t = pa.Table.from_batches([batch]) if isinstance(batch, pa.RecordBatch) else batch
            for r in t.to_pylist():
                if rows == 0:
                    pending = r
                elif rows == 1:
                    f.write(dump(pending))
                    f.write(dump(r))
                    pending = None
                else:
                    f.write(dump(r))
                rows += 1
        if rows == 1:
            f.write(yaml.safe_dump(_plain(pending), sort_keys=False,
                                   allow_unicode=True).encode(charset))
    return rows


def json_to_yaml_bytes(data: bytes, charset: str = "utf-8") -> bytes:
    """JsonToYaml: JSON / JSONL -> YAML (multi-doc if >1 record)."""
    text = data.decode(charset).strip()
    try:
        parsed = json.loads(text)
        records = parsed if isinstance(parsed, list) else [parsed]
    except json.JSONDecodeError:
        records = [json.loads(line) for line in text.splitlines() if line.strip()]
    return records_to_yaml(records).encode(charset)
