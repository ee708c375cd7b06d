"""Plain (uncompressed layout) and raw-IPC fallback codecs.

``plain`` is the baseline every specialized codec is guarded against (the
per-chunk "never lose to the reference Parquet plain encoding" rule,
SURVEY.md §7.3); ``raw_ipc`` is the universal fallback for nested types.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import (
    Codec, EncodeContext, _compact, fixed_from_numpy, fixed_to_numpy,
    int_view_dtype, is_fixed_int_like, is_var_binary, pack_sections,
    register, unpack_sections, validity_from_bytes, validity_to_bytes,
)
from .bitpack import pack_bools, unpack_bools


# lengths at or above this store as uint64 ("v8" chunks); module-level so
# tests can exercise the wide path without allocating a real 4 GiB cell
_U32_LEN_LIMIT = 1 << 32


class PlainCodec(Codec):
    """Raw value buffers + validity bitmap; no compression (outer wrap only)."""

    name = "plain"

    def encode(self, arr: pa.Array, ctx: EncodeContext) -> tuple[bytes, dict]:
        arr = _compact(arr)
        typ = arr.type
        n = len(arr)
        if is_var_binary(typ):
            from .base import varbin_parts
            offsets, data, validity = varbin_parts(arr)
            lengths64 = np.diff(offsets)
            if lengths64.size and int(lengths64.max()) >= _U32_LEN_LIMIT:
                # a single cell can legally exceed 4 GiB in large_binary /
                # large_string; uint32 would wrap the length silently and
                # corrupt every subsequent offset on decode
                payload = [validity_to_bytes(validity),
                           lengths64.astype(np.uint64).data.cast("B"), data]
                return payload, {"n": n, "k": "v8"}
            lengths = lengths64.astype(np.uint32)
            # section LIST: pack_chunk assembles chunk framing + sections in
            # ONE join, so the (dominant) data bytes are copied once, not
            # twice — this path carries the whole html/text payload
            # .cast("B"): section lengths are in BYTES (len() of a uint32
            # memoryview counts elements)
            payload = [validity_to_bytes(validity), lengths.data.cast("B"),
                       data]
            return payload, {"n": n, "k": "v"}
        if pa.types.is_boolean(typ):
            vals, validity = fixed_to_numpy(arr)
            payload = pack_sections([validity_to_bytes(validity), pack_bools(vals.astype(bool))])
            return payload, {"n": n, "k": "b"}
        if is_fixed_int_like(typ):
            vals, validity = fixed_to_numpy(arr)
            dt = int_view_dtype(typ)
            payload = pack_sections(
                [validity_to_bytes(validity), vals.astype(np.int64).astype(dt).tobytes()]
            )
            return payload, {"n": n, "k": "f"}
        if pa.types.is_decimal(typ) or pa.types.is_fixed_size_binary(typ):
            width = typ.byte_width
            buffers = arr.buffers()
            data = buffers[1].to_pybytes()[arr.offset * width : (arr.offset + n) * width]
            validity = arr.is_valid().to_numpy(zero_copy_only=False) if arr.null_count else None
            payload = pack_sections([validity_to_bytes(validity), data])
            return payload, {"n": n, "k": "w"}
        raise TypeError(f"plain codec does not support {typ}; use raw_ipc")

    def decode(self, payload: bytes, meta: dict, typ: pa.DataType) -> pa.Array:
        n = meta["n"]
        kind = meta["k"]
        sections = unpack_sections(payload)
        validity = validity_from_bytes(sections[0], n)
        if kind in ("v", "v8"):
            from .base import varbin_build
            ldt = np.uint32 if kind == "v" else np.uint64
            lengths = np.frombuffer(sections[1], dtype=ldt, count=n)
            offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lengths, out=offsets[1:])
            return varbin_build(offsets, sections[2], validity, typ)
        if kind == "b":
            vals = unpack_bools(sections[1], n).astype(np.int64)
            return fixed_from_numpy(vals, validity, typ)
        if kind == "f":
            dt = int_view_dtype(typ)
            vals = np.frombuffer(sections[1], dtype=dt, count=n).astype(np.int64)
            return fixed_from_numpy(vals, validity, typ)
        if kind == "w":
            vbuf = None
            nulls = 0
            if validity is not None:
                vbuf = pa.py_buffer(pack_bools(validity))
                nulls = int(n - validity.sum())
            return pa.Array.from_buffers(typ, n, [vbuf, pa.py_buffer(sections[1])], null_count=nulls)
        raise ValueError(f"unknown plain kind {kind}")


class RawIpcCodec(Codec):
    """Arrow IPC stream of a single-column batch — works for ANY type."""

    name = "raw_ipc"

    def encode(self, arr: pa.Array, ctx: EncodeContext) -> tuple[bytes, dict]:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        table = pa.table({"v": arr})
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, table.schema) as writer:
            writer.write_table(table)
        return sink.getvalue().to_pybytes(), {"n": len(arr)}

    def decode(self, payload: bytes, meta: dict, typ: pa.DataType) -> pa.Array:
        table = pa.ipc.open_stream(pa.BufferReader(payload)).read_all()
        col = table.column("v").combine_chunks()
        if col.type != typ:
            col = col.cast(typ)
        return col


register(PlainCodec())
register(RawIpcCodec())
