"""Dataset profiling: the one-pass `describe` every new table gets first.

:func:`profile` computes per-column summary statistics in a SINGLE
map-only pass — each block reduces to a fixed-width partial row per
column (count/nulls/sum/sumsq/min/max, string min/max + codepoint length
bounds), the driver merges the O(columns x blocks) partials with
associative min/max/sum folds, and the result is a small long-format
table ``(column, stat, value_num, value_str)``.  No shuffle at any
scale; the only thing that ever reaches the driver is one partial row
per column per block.

Exact-distinct counts are deliberately NOT here (they need a shuffle —
use :func:`~.relational.count_distinct` / the HLL sketches); the std is
the closed form ``sqrt((sumsq - sum^2/n) / (n-1))`` so a SQL twin can
reproduce it bit-for-near-bit from the same sums.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import package_runtime_env


def _partial(batch: pa.Table, cols: Sequence[str]) -> pa.Table:
    names, stats, nums, strs = [], [], [], []

    def emit(col: str, stat: str, num=None, s=None):
        names.append(col)
        stats.append(stat)
        nums.append(None if num is None else float(num))
        strs.append(s)

    for c in cols:
        arr = batch.column(c)
        n_null = arr.null_count
        n = len(arr) - n_null
        emit(c, "n", n)
        emit(c, "nulls", n_null)
        if n == 0:
            continue
        t = arr.type
        if pa.types.is_floating(t) or pa.types.is_integer(t):
            v = pc.drop_null(arr).combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.float64)
            emit(c, "sum", v.sum())
            emit(c, "sumsq", (v * v).sum())
            emit(c, "min", v.min())
            emit(c, "max", v.max())
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            mm = pc.min_max(arr)
            emit(c, "min", s=mm["min"].as_py())
            emit(c, "max", s=mm["max"].as_py())
            ln = pc.min_max(pc.utf8_length(arr))
            emit(c, "min_len", ln["min"].as_py())
            emit(c, "max_len", ln["max"].as_py())
        elif pa.types.is_timestamp(t) or pa.types.is_date(t):
            # temporal bounds as epoch microseconds in value_num
            us = arr.combine_chunks().cast(pa.timestamp("us"))
            mm = pc.min_max(us.cast(pa.int64()))
            emit(c, "min", mm["min"].as_py())
            emit(c, "max", mm["max"].as_py())
        # other types: n / nulls only
    return pa.table({
        "column": pa.array(names, type=pa.string()),
        "stat": pa.array(stats, type=pa.string()),
        "value_num": pa.array(nums, type=pa.float64()),
        "value_str": pa.array(strs, type=pa.string())})


def profile(ds, columns: Optional[Sequence[str]] = None,
            round_to: int = 9) -> pa.Table:
    """Per-column summary stats of a Dataset in one map-only pass.

    Returns a long-format ``pa.Table`` ``(column, stat, value_num,
    value_str)`` with, per column: ``n`` (non-null), ``nulls``; numerics
    add ``min/max/mean/std`` (std = sample closed form from the merged
    sum/sumsq, both rounded to ``round_to``); strings add lexicographic
    ``min/max`` (in ``value_str``) and codepoint ``min_len/max_len``;
    temporal columns add epoch-microsecond ``min/max``.  Columns of
    other types report n/nulls only.  ``std`` is NULL for n < 2."""
    sch = ds.schema()
    cols = list(columns) if columns is not None else list(sch.names)
    env = package_runtime_env()
    parts = ds.select_columns(cols).map_batches(
        lambda t: _partial(t, cols), batch_format="pyarrow",
        runtime_env=env).take_all()   # O(columns x blocks) fixed-width rows

    acc: dict = {}
    for r in parts:
        key = (r["column"], r["stat"])
        num, s = r["value_num"], r["value_str"]
        if key not in acc:
            acc[key] = [num, s]
            continue
        st = r["stat"]
        if st in ("n", "nulls", "sum", "sumsq"):
            acc[key][0] += num
        elif st in ("min", "min_len"):
            if num is not None and (acc[key][0] is None
                                    or num < acc[key][0]):
                acc[key][0] = num
            if s is not None and (acc[key][1] is None or s < acc[key][1]):
                acc[key][1] = s
        elif st in ("max", "max_len"):
            if num is not None and (acc[key][0] is None
                                    or num > acc[key][0]):
                acc[key][0] = num
            if s is not None and (acc[key][1] is None or s > acc[key][1]):
                acc[key][1] = s

    names, stats, nums, strs = [], [], [], []

    def emit(col, stat, num=None, s=None):
        names.append(col)
        stats.append(stat)
        nums.append(num)
        strs.append(s)

    for c in cols:
        n = acc.get((c, "n"), [0, None])[0] or 0
        emit(c, "n", float(n))
        emit(c, "nulls", acc.get((c, "nulls"), [0, None])[0] or 0.0)
        for st in ("min", "max", "min_len", "max_len"):
            if (c, st) in acc:
                emit(c, st, acc[(c, st)][0], acc[(c, st)][1])
        if (c, "sum") in acc:
            sm, sq = acc[(c, "sum")][0], acc[(c, "sumsq")][0]
            emit(c, "mean", round(sm / n, round_to))
            if n >= 2:
                var = (sq - sm * sm / n) / (n - 1)
                emit(c, "std", round(float(np.sqrt(max(var, 0.0))),
                                     round_to))
            else:
                emit(c, "std")
    return pa.table({
        "column": pa.array(names, type=pa.string()),
        "stat": pa.array(stats, type=pa.string()),
        "value_num": pa.array(nums, type=pa.float64()),
        "value_str": pa.array(strs, type=pa.string())})
