"""Codec protocol, registry, and shared Arrow <-> numpy helpers.

A codec encodes ONE pyarrow Array (a column chunk) to bytes and decodes it
back to a semantically identical array (``pa.Array.equals``, null masks
included). Codecs are pure and stateless given an :class:`EncodeContext`
(which may carry shared state such as a pre-trained FSST symbol table built
in the sample pass — the Ray-side equivalent of the reference's schema
inference pre-pass, see /root/reference avro/AbstractAvroConverter.java:159).
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np
import pyarrow as pa

from .bitpack import pack_bools, unpack_bools

# ---------------------------------------------------------------------------
# section framing: concat N byte sections with u32 length prefixes
# ---------------------------------------------------------------------------


def pack_sections(sections: list) -> bytes:
    out = [struct.pack("<I", len(sections))]
    for s in sections:
        out.append(struct.pack("<Q", len(s)))
        out.append(s)
    return b"".join(out)


def unpack_sections(data) -> list:
    """Split framed sections back out as ZERO-COPY memoryviews over ``data``
    (every consumer — np.frombuffer, pa.py_buffer, struct, zstd — speaks the
    buffer protocol; the decode path never duplicates the payload)."""
    mv = data if isinstance(data, memoryview) else memoryview(data)
    (k,) = struct.unpack_from("<I", mv, 0)
    pos = 4
    out = []
    for _ in range(k):
        (ln,) = struct.unpack_from("<Q", mv, pos)
        pos += 8
        out.append(mv[pos : pos + ln])
        pos += ln
    return out


# ---------------------------------------------------------------------------
# nested chunk serialization (codecs composing codecs, e.g. dict values)
# ---------------------------------------------------------------------------


def pack_chunk(codec_name: str, meta: dict, payload) -> bytes:
    header = json.dumps({"c": codec_name, "m": meta}, separators=(",", ":")).encode()
    if isinstance(payload, list):
        # fused pack_chunk(pack_sections(...)): ONE join instead of two full
        # passes over the payload bytes — the encode hot path is memory-
        # bandwidth-bound, so every avoided copy is wall time
        parts = [struct.pack("<I", len(header)), header,
                 struct.pack("<I", len(payload))]
        for s in payload:
            parts.append(struct.pack("<Q", len(s)))
            parts.append(s)
        return b"".join(parts)
    return struct.pack("<I", len(header)) + header + payload


def unpack_chunk(data) -> tuple[str, dict, memoryview]:
    mv = data if isinstance(data, memoryview) else memoryview(data)
    (hlen,) = struct.unpack_from("<I", mv, 0)
    header = json.loads(bytes(mv[4 : 4 + hlen]))
    return header["c"], header["m"], mv[4 + hlen :]


# ---------------------------------------------------------------------------
# Arrow type <-> storage views
# ---------------------------------------------------------------------------

_INT_VIEW: dict[str, str] = {
    "int8": "i1", "int16": "i2", "int32": "i4", "int64": "i8",
    "uint8": "u1", "uint16": "u2", "uint32": "u4", "uint64": "u8",
    "float": "i4", "double": "i8", "halffloat": "i2",
    "date32[day]": "i4", "date64[ms]": "i8",
    "time32[s]": "i4", "time32[ms]": "i4",
    "time64[us]": "i8", "time64[ns]": "i8",
}


def int_view_dtype(typ: pa.DataType) -> Optional[np.dtype]:
    """numpy signed-int dtype that bit-views this fixed-width type, or None."""
    s = str(typ)
    if s in _INT_VIEW:
        return np.dtype("<" + _INT_VIEW[s])
    if pa.types.is_timestamp(typ) or pa.types.is_duration(typ):
        return np.dtype("<i8")
    return None


def is_fixed_int_like(typ: pa.DataType) -> bool:
    return int_view_dtype(typ) is not None


def is_var_binary(typ: pa.DataType) -> bool:
    return (
        pa.types.is_string(typ)
        or pa.types.is_large_string(typ)
        or pa.types.is_binary(typ)
        or pa.types.is_large_binary(typ)
    )


def _compact(arr: pa.Array) -> pa.Array:
    """Return an equivalent array with offset 0 and 0-based offsets buffer."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.offset != 0:
        arr = pa.concat_arrays([arr])
    return arr


def fixed_to_numpy(arr: pa.Array) -> tuple[np.ndarray, Optional[np.ndarray]]:
    """Fixed-width array -> (int64 values with nulls as 0, validity bool or None).

    Values are a bit-exact reinterpretation (floats keep their bit pattern).
    """
    arr = _compact(arr)
    typ = arr.type
    if pa.types.is_boolean(typ):
        np_vals = arr.cast(pa.uint8()).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        dt = int_view_dtype(typ)
        if dt is None:
            raise TypeError(f"not fixed-int-like: {typ}")
        iv = arr.view(pa.int64() if dt.itemsize == 8 else
                      pa.int32() if dt.itemsize == 4 else
                      pa.int16() if dt.itemsize == 2 else pa.int8())
        np_vals = iv.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    validity = None
    if arr.null_count:
        validity = arr.is_valid().to_numpy(zero_copy_only=False)
    return np_vals, validity


def fixed_from_numpy(values: np.ndarray, validity: Optional[np.ndarray], typ: pa.DataType) -> pa.Array:
    """Inverse of :func:`fixed_to_numpy`."""
    n = len(values)
    vbuf = None
    nulls = 0
    if validity is not None:
        vbuf = pa.py_buffer(pack_bools(validity))
        nulls = int(n - validity.sum())
    if pa.types.is_boolean(typ):
        bits = pa.py_buffer(pack_bools(values.astype(bool)))
        return pa.Array.from_buffers(typ, n, [vbuf, bits], null_count=nulls)
    dt = int_view_dtype(typ)
    data = pa.py_buffer(np.ascontiguousarray(values.astype(np.int64).astype(dt)).tobytes())
    return pa.Array.from_buffers(typ, n, [vbuf, data], null_count=nulls)


def varbin_parts(arr: pa.Array) -> tuple[np.ndarray, "bytes | memoryview", Optional[np.ndarray]]:
    """Var-width binary/string array -> (int64 offsets, data bytes, validity).

    ``data`` is a zero-copy memoryview over the Arrow buffer (keeps the
    buffer alive); every downstream consumer (zstd, crc32, join, frombuffer)
    speaks the buffer protocol, so the column's payload bytes are never
    copied on the encode path."""
    arr = _compact(arr)
    typ = arr.type
    off_dt = np.int64 if (pa.types.is_large_string(typ) or pa.types.is_large_binary(typ)) else np.int32
    buffers = arr.buffers()
    n = len(arr)
    offsets = np.frombuffer(buffers[1], dtype=off_dt, count=n + 1).astype(np.int64)
    start = int(offsets[0])
    data = memoryview(buffers[2])[start : int(offsets[-1])] if buffers[2] is not None else b""
    if start:
        offsets = offsets - start
    validity = None
    if arr.null_count:
        validity = arr.is_valid().to_numpy(zero_copy_only=False)
    return offsets, data, validity


def varbin_build(offsets: np.ndarray, data: bytes, validity: Optional[np.ndarray], typ: pa.DataType) -> pa.Array:
    """Inverse of :func:`varbin_parts`."""
    n = len(offsets) - 1
    large = pa.types.is_large_string(typ) or pa.types.is_large_binary(typ)
    off_dt = np.int64 if large else np.int32
    vbuf = None
    nulls = 0
    if validity is not None:
        vbuf = pa.py_buffer(pack_bools(validity))
        nulls = int(n - validity.sum())
    obuf = pa.py_buffer(np.ascontiguousarray(offsets.astype(off_dt)).tobytes())
    return pa.Array.from_buffers(typ, n, [vbuf, obuf, pa.py_buffer(data)], null_count=nulls)


def validity_to_bytes(validity: Optional[np.ndarray]) -> bytes:
    return b"" if validity is None else pack_bools(validity)


def validity_from_bytes(data: bytes, n: int) -> Optional[np.ndarray]:
    return None if not data else unpack_bools(data, n)


# ---------------------------------------------------------------------------
# codec protocol + registry
# ---------------------------------------------------------------------------


@dataclass
class EncodeContext:
    """Per-run knobs and shared (sample-pass-trained) state for codecs."""

    outer_level: int = 3            # zstd level for the container's outer wrap
    # (measured on the synthetic corpus: zstd-3 beats levels 6-12 in BOTH
    # speed (667MB/s/core) and ratio on templated html; see BASELINE.md)
    fsst_sample_bytes: int = 1 << 16
    # column name -> pre-trained FSST symbol table bytes (from the sample pass)
    fsst_tables: dict[str, bytes] = field(default_factory=dict)
    column: str = ""                # name of the column currently being encoded


class Codec:
    name: str = "?"

    def encode(self, arr: pa.Array, ctx: EncodeContext) -> tuple[bytes, dict]:
        raise NotImplementedError

    def decode(self, payload: bytes, meta: dict, typ: pa.DataType) -> pa.Array:
        raise NotImplementedError


_REGISTRY: dict[str, Codec] = {}


def register(codec: Codec) -> Codec:
    _REGISTRY[codec.name] = codec
    return codec


def get_codec(name: str) -> Codec:
    return _REGISTRY[name]


def codec_names() -> list[str]:
    return sorted(_REGISTRY)


def encode_array(arr: pa.Array, codec_name: str, ctx: Optional[EncodeContext] = None) -> bytes:
    """Encode with a named codec -> self-describing chunk bytes."""
    ctx = ctx or EncodeContext()
    codec = get_codec(codec_name)
    payload, meta = codec.encode(arr, ctx)
    return pack_chunk(codec_name, meta, payload)


def decode_array(chunk: bytes, typ: pa.DataType) -> pa.Array:
    """Decode self-describing chunk bytes back to an array of ``typ``."""
    name, meta, payload = unpack_chunk(chunk)
    return get_codec(name).decode(payload, meta, typ)


def decode_array_dictionary(chunk: bytes, typ: pa.DataType) -> pa.Array:
    """Decode chunk bytes to ``dictionary<int32, typ>`` WITHOUT materializing
    the flat column (late materialization).

    For dict-family chunks this skips the ``values.take(indices)`` expansion
    entirely — the stored uniques + indices become the DictionaryArray
    as-is, so a 100 TB `lang`-style column decodes to O(card) value bytes
    per chunk and downstream groupby/filter run on int32 codes. Chunks a
    per-chunk guard fell back to another codec decode flat and re-encode
    (correctness over speed for that chunk only)."""
    name, meta, payload = unpack_chunk(chunk)
    codec = get_codec(name)
    decode_dict = getattr(codec, "decode_dictionary", None)
    if decode_dict is not None:
        return decode_dict(payload, meta, typ)
    return codec.decode(payload, meta, typ).dictionary_encode()
