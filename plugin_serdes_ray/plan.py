"""Two-pass codec auto-selection: sample stats -> cost model -> EncodePlan.

Pass 1 samples batches, computes per-column stats, merges them
associatively on the driver — the same partial+final-aggregate shape as the
reference's schema inference over the first N rows
(/root/reference avro/infer/InferAvroSchema.java:52-58, mergeTypes at
:201-271; numberOfRowsToScan default 100 at AbstractAvroConverter.java:50).
The frozen plan (codec per column + shared FSST symbol tables) is then
broadcast to pass-2 encode workers via ``ray.put``.

Selection is a measured cost model, not pure heuristics: a heuristic
shortlist of <=3 candidate codecs per column is actually encoded on the
sample and the smallest wins (with a zstd outer wrap applied, mirroring the
container). The per-chunk plain-fallback guard in container.py catches any
residual mis-selection.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa

from .codecs import EncodeContext, encode_array
from .codecs.base import fixed_to_numpy, is_fixed_int_like, is_var_binary
from .codecs import fsst as fsst_mod
from .container import _outer_compress


@dataclass
class EncodePlan:
    """Frozen output of the sample pass; shipped to every encode worker."""

    codecs: dict[str, str] = field(default_factory=dict)
    fsst_tables: dict[str, bytes] = field(default_factory=dict)  # column -> serialized table
    outer_level: int = 3
    stats: dict[str, dict] = field(default_factory=dict)

    def context(self) -> EncodeContext:
        return EncodeContext(outer_level=self.outer_level,
                             fsst_tables=dict(self.fsst_tables))


# ---------------------------------------------------------------------------
# per-column stats (vectorized; associative merge)
# ---------------------------------------------------------------------------


def column_stats(arr: pa.ChunkedArray | pa.Array) -> dict:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    s: dict = {"n": n, "nulls": arr.null_count, "bytes": arr.nbytes}
    if n == 0:
        return s
    typ = arr.type
    try:
        s["distinct"] = len(arr.unique())
    except Exception:
        s["distinct"] = n
    if is_fixed_int_like(typ) and not pa.types.is_floating(typ):
        vals, validity = fixed_to_numpy(arr)
        live = vals if validity is None else vals[validity]
        if len(live):
            s["min"] = int(live.min())
            s["max"] = int(live.max())
            d = np.diff(live)
            s["sorted_frac"] = float((d >= 0).mean()) if len(d) else 1.0
        s["runs"] = int((vals[1:] != vals[:-1]).sum()) + 1 if n > 1 else 1
    elif pa.types.is_floating(typ):
        # runs on the BIT PATTERNS (bit-exact reinterpretation, so repeated
        # identical NaNs still form one run); min/max/sorted_frac are
        # meaningless on bit patterns and stay unset — only the RLE
        # shortlist gate reads runs for floats
        vals, _ = fixed_to_numpy(arr)
        s["runs"] = int((vals[1:] != vals[:-1]).sum()) + 1 if n > 1 else 1
    elif is_var_binary(typ):
        import pyarrow.compute as pc
        lens = pc.binary_length(arr).cast(pa.int64())
        s["avg_len"] = float(pc.mean(lens).as_py() or 0.0)
        if n > 1:
            neq = pc.not_equal(arr.slice(1), arr.slice(0, n - 1))
            s["runs"] = int(pc.sum(neq.cast(pa.int8())).as_py() or 0) + 1
        else:
            s["runs"] = 1
    return s


def merge_stats(a: dict, b: dict) -> dict:
    if not a:
        return dict(b)
    out = {"n": a["n"] + b["n"], "nulls": a["nulls"] + b["nulls"],
           "bytes": a.get("bytes", 0) + b.get("bytes", 0)}
    out["distinct"] = min(a.get("distinct", 0) + b.get("distinct", 0), out["n"])
    for k, f in (("min", min), ("max", max)):
        if k in a or k in b:
            vals = [x[k] for x in (a, b) if k in x]
            out[k] = f(vals)
    if "runs" in a or "runs" in b:
        out["runs"] = a.get("runs", 0) + b.get("runs", 0)
    for k in ("sorted_frac", "avg_len"):
        if k in a or k in b:
            wa, wb = a.get("n", 0), b.get("n", 0)
            out[k] = (a.get(k, 0.0) * wa + b.get(k, 0.0) * wb) / max(wa + wb, 1)
    return out


# ---------------------------------------------------------------------------
# candidate shortlist + measured selection
# ---------------------------------------------------------------------------


def shortlist(stats: dict, typ: pa.DataType) -> list[str]:
    n = max(stats.get("n", 0), 1)
    nulls = stats.get("nulls", 0)
    distinct = stats.get("distinct", n)
    runs = stats.get("runs", n)
    if nulls == n:
        return ["constant"]
    if distinct == 1 and nulls == 0:
        return ["constant"]
    if is_var_binary(typ):
        cands = []
        if distinct <= max(n // 4, 2) and distinct <= (1 << 16):
            cands.append("dict_rle" if runs / n <= 0.5 else "dict")
            if stats.get("avg_len", 0) >= 16:
                cands.append("dict_fsst")
        if stats.get("avg_len", 0) >= 6:
            cands.append("fsst")
        cands.append("plain")
        return cands[:3]
    if is_fixed_int_like(typ) and not pa.types.is_floating(typ):
        cands = []
        if runs / n <= 0.2:
            cands.append("rle")
        if distinct <= max(n // 4, 2) and distinct <= (1 << 16):
            cands.append("dict")
        if stats.get("sorted_frac", 0.0) >= 0.9:
            cands.append("delta")
        span_ok = "min" in stats and (stats["max"] - stats["min"]) < (1 << 62)
        if span_ok:
            cands.append("for")
        cands.append("plain")
        return cands[:3]
    if pa.types.is_floating(typ) or pa.types.is_decimal(typ) or pa.types.is_fixed_size_binary(typ):
        cands = []
        if runs / n <= 0.2 and pa.types.is_floating(typ):
            cands.append("rle")
        if distinct <= max(n // 4, 2) and distinct <= (1 << 16):
            cands.append("dict")
        if pa.types.is_floating(typ):
            # byte-stream-split: size-neutral transpose that usually wins
            # under the outer zstd on real float data; the measurement
            # pass decides (floats get a 4-wide shortlist so plain stays)
            cands.append("bss")
        cands.append("plain")
        return cands[:4]
    if pa.types.is_boolean(typ):
        return ["rle", "plain"]
    return ["raw_ipc"]


MEASURE_MAX_ROWS = 2048
MEASURE_MAX_BYTES = 4 << 20


def _even_blocks(arr: pa.Array, rows: int, block: int = 256) -> pa.Array:
    """Subsample ``rows`` rows as evenly-spaced CONTIGUOUS blocks. A head
    slice would reintroduce the bias the scattered corpus sample exists to
    remove (stats/trial-encodes would see only the earliest files' rows);
    a fully strided take would destroy the local run structure that the
    runs stat and RLE trial sizes depend on. Even blocks give span
    coverage AND adjacency."""
    n = len(arr)
    if rows >= n:
        return arr
    k = max(rows // block, 1)
    blen = max(rows // k, 1)
    starts = np.unique(np.linspace(0, n - blen, k).astype(np.int64))
    return pa.concat_arrays([arr.slice(int(s), blen) for s in starts])


def _bounded_slice(arr: pa.Array) -> pa.Array:
    """Cap the trial-encode sample by rows AND bytes so planning stays
    O(MB); even-block subsample, not a head slice."""
    n = len(arr)
    if n == 0:
        return arr
    rows = min(n, MEASURE_MAX_ROWS)
    bytes_per_row = max(arr.nbytes / n, 1e-9)
    rows = max(min(rows, int(MEASURE_MAX_BYTES / bytes_per_row)), 64 if n >= 64 else n)
    return _even_blocks(arr, rows)


# Measured single-core encode cost (slower codecs must EARN their keep in
# compressed size; keeps 100TB-scale throughput from collapsing for a few %):
# a codec is picked only if its sample size beats the best cheaper codec by
# more than its penalty fraction. With the C greedy kernel (fsst_native,
# ~130-250 MB/s measured vs 3-5 MB/s for the replace chains) fsst is no
# longer order-of-magnitude slower than plain+zstd, so the penalty is small;
# it jumps back up if only the pure-python fallback is available.
_SPEED_PENALTY: dict | None = None


def speed_penalty() -> dict[str, float]:
    """Lazy: probing/compiling the C kernel at module import would block
    every importer (decode-only workers included) on a subprocess."""
    global _SPEED_PENALTY
    if _SPEED_PENALTY is None:
        from .codecs.fsst_native import get_lib

        _SPEED_PENALTY = ({"fsst": 0.03, "dict_fsst": 0.02}
                          if get_lib() is not None
                          else {"fsst": 0.15, "dict_fsst": 0.04})
    return _SPEED_PENALTY


def measure_and_pick(arr: pa.Array, candidates: list[str],
                     ctx: EncodeContext) -> tuple[str, dict[str, int]]:
    """Encode a bounded sample with each candidate (+outer wrap); pick the
    smallest penalty-adjusted size."""
    arr = _bounded_slice(arr)
    sizes: dict[str, int] = {}
    for name in candidates:
        try:
            blob = encode_array(arr, name, ctx)
            wrapped, _ = _outer_compress(blob, ctx.outer_level)
            sizes[name] = len(wrapped)
        except Exception:
            continue
    if not sizes:
        return "raw_ipc", sizes
    pen = speed_penalty()
    best = min(sizes, key=lambda k: sizes[k] * (1.0 + pen.get(k, 0.0)))
    return best, sizes


def _plan_column(name: str, col: pa.Array, typ: pa.DataType,
                 outer_level: int, fsst_train_bytes: int) -> tuple:
    """Stats + shortlist + optional FSST train + measured pick for ONE
    column, with a private EncodeContext (thread-safe)."""
    ctx = EncodeContext(outer_level=outer_level)
    n = len(col)
    if n:
        # bound the stats sample: planning must stay O(MB) per column no
        # matter how large the provided sample is. Even blocks across the
        # whole provided sample — a head slice here silently undid the
        # scattered corpus sampling for stats, FSST training, and the
        # measured pick (review r4)
        rows = min(n, 8192)
        bpr = max(col.nbytes / n, 1e-9)
        rows = max(min(rows, int((16 << 20) / bpr)), min(n, 256))
        if rows < n:
            col = _even_blocks(col, rows)
    stats = column_stats(col)
    cands = shortlist(stats, typ)
    fsst_table = None
    if any(c in ("fsst", "dict_fsst") for c in cands) and is_var_binary(typ):
        from .codecs.base import varbin_parts
        _, data, _ = varbin_parts(col)
        table = fsst_mod.train_table(data[:fsst_train_bytes])
        fsst_table = fsst_mod.serialize_table(table)
        ctx.fsst_tables[name] = fsst_table
    ctx.column = name
    choice, sizes = measure_and_pick(col, cands, ctx)
    stats["candidate_sizes"] = sizes
    return name, choice, stats, fsst_table


def build_plan(sample: pa.Table, outer_level: int = 3,
               fsst_train_bytes: int = 1 << 18) -> EncodePlan:
    """Driver-side plan construction from a sample table. Columns plan in a
    thread pool — the trial encodes spend their time in zstd/numpy/C-FSST
    kernels that release the GIL, so wide tables plan ~n_cores faster."""
    from concurrent.futures import ThreadPoolExecutor

    plan = EncodePlan(outer_level=outer_level)
    jobs = [(name, sample.column(name).combine_chunks(),
             sample.schema.field(name).type)
            for name in sample.column_names]
    if len(jobs) <= 1:
        results = [_plan_column(n, c, t, outer_level, fsst_train_bytes)
                   for n, c, t in jobs]
    else:
        with ThreadPoolExecutor(max_workers=min(len(jobs), 8)) as pool:
            results = list(pool.map(
                lambda j: _plan_column(*j, outer_level, fsst_train_bytes),
                jobs))
    for name, choice, stats, fsst_table in results:
        plan.codecs[name] = choice
        plan.stats[name] = stats
        if fsst_table is not None:
            plan.fsst_tables[name] = fsst_table
    return plan
