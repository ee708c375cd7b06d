"""Equality helpers for bit-identity tests (NaN-aware)."""

from __future__ import annotations

import struct

import pyarrow as pa

from .codecs.base import fixed_to_numpy, is_fixed_int_like


def _has_float(t: pa.DataType) -> bool:
    if pa.types.is_floating(t):
        return True
    if pa.types.is_list(t) or pa.types.is_large_list(t) \
            or pa.types.is_fixed_size_list(t):
        return _has_float(t.value_type)
    if pa.types.is_struct(t):
        return any(_has_float(f.type) for f in t)
    if pa.types.is_map(t):
        return _has_float(t.key_type) or _has_float(t.item_type)
    return False


def _nan_eq(x, y) -> bool:
    """Recursive python equality; floats by BIT PATTERN (nested fallback
    only) — same contract as the flat fixed_to_numpy path: NaN == NaN only
    when payload bits match, and -0.0 != 0.0. to_pylist widens float32 to
    double, but the widening is injective so double-bit compare is exact."""
    if isinstance(x, float) and isinstance(y, float):
        return struct.pack("<d", x) == struct.pack("<d", y)
    if isinstance(x, dict) and isinstance(y, dict):
        return x.keys() == y.keys() and all(_nan_eq(x[k], y[k]) for k in x)
    if isinstance(x, (list, tuple)) and isinstance(y, (list, tuple)):
        return len(x) == len(y) and all(_nan_eq(p, q) for p, q in zip(x, y))
    return type(x) is type(y) and x == y


def arrays_equal(a: pa.Array, b: pa.Array) -> bool:
    """Semantic equality incl. null masks; floats compared by bit pattern
    (NaN == NaN when the payload bits match), including floats nested in
    list/struct/map columns (pa.equals alone would fail those on NaN)."""
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
    if _has_float(a.type):
        # nested floats: slow python fallback, tests-only and only reached
        # when pa.equals already said False (i.e. NaN is in play or they
        # genuinely differ)
        return _nan_eq(a.to_pylist(), b.to_pylist())
    return False


def tables_equal(a: pa.Table, b: pa.Table) -> bool:
    if a.schema != b.schema or a.num_rows != b.num_rows:
        return False
    return all(
        arrays_equal(a.column(i).combine_chunks(), b.column(i).combine_chunks())
        for i in range(a.num_columns)
    )
