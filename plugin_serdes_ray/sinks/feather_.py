"""Table -> Feather (Arrow IPC file) bytes/file."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.feather as feather


def table_to_feather_bytes(table: pa.Table,
                           compression: str = "zstd") -> bytes:
    sink = pa.BufferOutputStream()
    feather.write_feather(table, sink, compression=compression)
    return sink.getvalue().to_pybytes()


def write_feather(table: pa.Table, path: str,
                  compression: str = "zstd") -> None:
    feather.write_feather(table, path, compression=compression)
