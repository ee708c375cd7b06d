"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here may
call ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship pipeline (webpages corpus re-encode) at sf0.001.
- ``queries()``: one callable per implemented operator/pipeline (SURVEY.md §2).
- ``oracle_sql()``: DuckDB-equivalent SQL per query (same column names).
"""

from __future__ import annotations

import glob
import os
from collections.abc import Callable
from typing import Any

_QUERY_CACHE_ROOT = "/tmp/graft_query_cache"


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)) or "sf"


def _roundtrip(sf_dir: str, table: str):
    """Encode one testdata table through the container engine and decode it
    back — the flagship correctness path (bit-identical serde round trip)."""
    from plugin_serdes_ray.encode import decode_table, encode_files

    src = os.path.join(sf_dir, f"{table}.parquet")
    out = os.path.join(_QUERY_CACHE_ROOT, _sf_tag(sf_dir), f"rt_{table}")
    encode_files([src], out, resume=True)
    return decode_table(out)


def entry() -> Any:
    """Flagship: generate the sf0.001 webpages corpus, run the two-pass
    codec-auto-selected re-encode, return the decoded Dataset."""
    from plugin_serdes_ray.encode import decode_dataset, encode_files
    from plugin_serdes_ray.fixtures import webpages_for_sf

    files = webpages_for_sf("/root/testdata/sf0.001")
    out = os.path.join(_QUERY_CACHE_ROOT, "sf0.001", "flagship")
    encode_files(files, out, resume=True)
    return decode_dataset(out)


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {
        "roundtrip_lineitem": lambda sf: _roundtrip(sf, "lineitem"),
        "roundtrip_orders": lambda sf: _roundtrip(sf, "orders"),
        "roundtrip_documents": lambda sf: _roundtrip(sf, "documents"),
        "roundtrip_events": lambda sf: _roundtrip(sf, "events"),
        "roundtrip_customer": lambda sf: _roundtrip(sf, "customer"),
    }
    return q


def oracle_sql() -> dict[str, str]:
    return {
        "roundtrip_lineitem": "SELECT * FROM lineitem",
        "roundtrip_orders": "SELECT * FROM orders",
        "roundtrip_documents": "SELECT * FROM documents",
        "roundtrip_events": "SELECT * FROM events",
        "roundtrip_customer": "SELECT * FROM customer",
    }
