"""Parquet -> Dataset (ParquetToIon analog,
/root/reference parquet/ParquetToIon.java:71-159).

This is the engine's PRIMARY read path: `ray.data.read_parquet` is native,
parallel (file/row-group splits) and zero-copy to Arrow — the reference by
contrast copies to a local temp file and deserializes row by row through
Avro GenericRecords (:96-114). Column pruning pushes down.
"""

from __future__ import annotations

from typing import Optional


def read_parquet(paths, columns: Optional[list[str]] = None,
                 override_num_blocks: Optional[int] = None, **kw):
    import ray.data

    return ray.data.read_parquet(paths, columns=columns,
                                 override_num_blocks=override_num_blocks, **kw)


def read_parquet_table(path: str, columns: Optional[list[str]] = None):
    import pyarrow.parquet as pq

    return pq.read_table(path, columns=columns)
