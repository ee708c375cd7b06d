"""Table -> ORC bytes/file (columnar interchange sink; see sources/orc_)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.orc as orc


def table_to_orc_bytes(table: pa.Table, compression: str = "zstd") -> bytes:
    sink = pa.BufferOutputStream()
    orc.write_table(table, sink, compression=compression)
    return sink.getvalue().to_pybytes()


def write_orc(table: pa.Table, path: str, compression: str = "zstd") -> None:
    orc.write_table(table, path, compression=compression)
