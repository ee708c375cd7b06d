"""Dataset -> Parquet (IonToParquet analog,
/root/reference parquet/IonToParquet.java:103-240) with the reference's
defaults: GZIP compression (:115), format v2 (:122,184), 128 MiB row
groups (:129), 1 MiB pages (:136,143), dictionary encoding on (:187).

The engine's own container format (plugin_serdes_ray.container) supersedes
this sink for the re-encode pipeline; this wrapper exists for drop-in
parity with the reference task.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

REFERENCE_DEFAULTS = dict(
    compression="gzip",
    use_dictionary=True,
    data_page_size=1 << 20,
    data_page_version="2.0",
)


def write_parquet(ds, path_or_dir: str, *, compression: str = "gzip",
                  row_group_size: int = 128 << 20,
                  single_file: bool = True) -> int:
    """compression: UNCOMPRESSED | SNAPPY | GZIP | ZSTD (IonToParquet enum,
    :225-234), default GZIP like the reference."""
    comp = compression.lower()
    if comp == "uncompressed":
        comp = "none"
    if single_file:
        tables = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
                  for b in ds.iter_batches(batch_format="pyarrow")]
        table = pa.concat_tables(tables) if tables else pa.table({})
        avg_row = max(table.nbytes // max(table.num_rows, 1), 1)
        pq.write_table(table, path_or_dir, compression=comp,
                       use_dictionary=True, data_page_size=1 << 20,
                       data_page_version="2.0",
                       row_group_size=max(row_group_size // avg_row, 1))
        return table.num_rows
    ds.write_parquet(path_or_dir, compression=comp)
    return ds.count()


def table_to_parquet_bytes(table: pa.Table, compression: str = "gzip") -> bytes:
    sink = pa.BufferOutputStream()
    pq.write_table(table, sink, compression=compression.lower(),
                   use_dictionary=True, data_page_size=1 << 20,
                   data_page_version="2.0")
    return sink.getvalue().to_pybytes()
