"""Dictionary codec: unique values + bit-packed or RLE'd indices.

The write-side analogue of the reference's always-on Parquet dictionary
encoding (/root/reference parquet/IonToParquet.java:187), generalized:
index stream is FoR-bit-packed by default ("dict") and RLE'd when the
selector sees long runs ("dict_rle", e.g. `lang` after a groupby-lang
repartition, SURVEY.md §7.2.4); "dict_fsst" additionally FSST-compresses
the unique values for high-cardinality string columns.
"""

from __future__ import annotations

import pyarrow as pa

from .base import (
    Codec, EncodeContext, _compact, decode_array, encode_array,
    is_var_binary, pack_sections, register, unpack_sections,
)


class DictCodec(Codec):
    def __init__(self, name: str, index_codec: str, fsst_values: bool) -> None:
        self.name = name
        self.index_codec = index_codec
        self.fsst_values = fsst_values

    def encode(self, arr: pa.Array, ctx: EncodeContext) -> tuple[bytes, dict]:
        arr = _compact(arr)
        denc = arr.dictionary_encode()
        values = denc.dictionary
        indices = denc.indices  # int32, null where arr is null
        if self.fsst_values and is_var_binary(values.type):
            values_chunk = encode_array(values, "fsst", ctx)
        else:
            try:
                values_chunk = encode_array(values, "plain", ctx)
            except TypeError:
                values_chunk = encode_array(values, "raw_ipc", ctx)
        idx_chunk = encode_array(indices, self.index_codec, ctx)
        payload = pack_sections([values_chunk, idx_chunk])
        return payload, {"n": len(arr), "card": len(values)}

    def decode(self, payload: bytes, meta: dict, typ: pa.DataType) -> pa.Array:
        values_chunk, idx_chunk = unpack_sections(payload)
        values = decode_array(values_chunk, typ)
        indices = decode_array(idx_chunk, pa.int32())
        if len(indices) == 0:
            return pa.array([], type=typ)
        return values.take(indices)

    def decode_dictionary(self, payload: bytes, meta: dict,
                          typ: pa.DataType) -> pa.Array:
        """Late-materialization decode: stored uniques + indices ARE the
        DictionaryArray — no take() expansion (see
        base.decode_array_dictionary)."""
        values_chunk, idx_chunk = unpack_sections(payload)
        values = decode_array(values_chunk, typ)
        indices = decode_array(idx_chunk, pa.int32())
        return pa.DictionaryArray.from_arrays(indices, values)


register(DictCodec("dict", "for", False))
register(DictCodec("dict_rle", "rle", False))
register(DictCodec("dict_fsst", "for", True))
