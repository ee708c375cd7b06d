"""Vectorized bit-packing primitives (numpy only, no Python loops).

Little-endian bit order throughout, matching the Arrow validity-bitmap
layout so packed validity round-trips through ``np.packbits(bitorder="little")``.
"""

from __future__ import annotations

import numpy as np


def pack_uints(values: np.ndarray, width: int) -> bytes:
    """Pack ``values`` (any unsigned int dtype) into ``width`` bits each.

    width == 0 encodes the all-zeros array as b"".
    """
    n = len(values)
    if n == 0 or width == 0:
        return b""
    if width > 64:
        raise ValueError(f"bit width {width} > 64")
    v = np.ascontiguousarray(values, dtype="<u8")
    as_bytes = v.view(np.uint8).reshape(n, 8)
    bits = np.unpackbits(as_bytes, axis=1, bitorder="little")[:, :width]
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_uints(data: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_uints`; returns uint64 array of length n."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), bitorder="little")
    bits = bits[: n * width].reshape(n, width)
    full = np.zeros((n, 64), dtype=np.uint8)
    full[:, :width] = bits
    return np.packbits(full, axis=1, bitorder="little").view("<u8").ravel().astype(np.uint64)


def bit_width(max_value: int) -> int:
    """Bits needed to represent max_value (0 -> 0 bits)."""
    if max_value < 0:
        raise ValueError("bit_width expects a non-negative value")
    return int(max_value).bit_length()


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """Signed int64 -> uint64 zigzag ((v << 1) ^ (v >> 63))."""
    v = values.astype(np.int64, copy=False)
    return ((v.astype(np.uint64) << np.uint64(1)) ^ (v >> np.int64(63)).astype(np.uint64))


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    """uint64 zigzag -> signed int64."""
    v = values.astype(np.uint64, copy=False)
    return ((v >> np.uint64(1)).astype(np.int64)) ^ -((v & np.uint64(1)).astype(np.int64))


def pack_bools(mask: np.ndarray) -> bytes:
    """Boolean array -> LSB-first packed bitmap (Arrow validity layout)."""
    return np.packbits(mask.astype(np.uint8), bitorder="little").tobytes()


def unpack_bools(data: bytes, n: int) -> np.ndarray:
    """Inverse of :func:`pack_bools`."""
    if n == 0:
        return np.empty(0, dtype=bool)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), bitorder="little")
    return bits[:n].astype(bool)
