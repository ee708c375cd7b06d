"""Equality helpers for bit-identity tests (NaN-aware)."""

from __future__ import annotations

import pyarrow as pa

from .codecs.base import fixed_to_numpy, is_fixed_int_like


def arrays_equal(a: pa.Array, b: pa.Array) -> bool:
    """Semantic equality incl. null masks; floats compared by bit pattern
    (NaN == NaN when the payload bits match)."""
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    if a.type != b.type or len(a) != len(b):
        return False
    if a.equals(b):
        return True
    if pa.types.is_floating(a.type) and is_fixed_int_like(a.type):
        va, ma = fixed_to_numpy(a)
        vb, mb = fixed_to_numpy(b)
        if (ma is None) != (mb is None):
            return False
        if ma is not None and not (ma == mb).all():
            return False
        if ma is not None:
            return bool((va[ma] == vb[mb]).all())
        return bool((va == vb).all())
    return False


def tables_equal(a: pa.Table, b: pa.Table) -> bool:
    if a.schema != b.schema or a.num_rows != b.num_rows:
        return False
    return all(
        arrays_equal(a.column(i).combine_chunks(), b.column(i).combine_chunks())
        for i in range(a.num_columns)
    )
