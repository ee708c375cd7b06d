"""F2/F3 fixture round trips: every reference-supported type through the
container engine, plus Hypothesis property tests for the codec layer
(reference layer-1/layer-2 analog: full.avsc round trips,
FullIonConversionAbstractTest)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from plugin_serdes_ray.codecs import decode_array, encode_array
from plugin_serdes_ray.container import read_partition, write_partition
from plugin_serdes_ray.fixtures import generate_alltypes, generate_nested
from plugin_serdes_ray.plan import build_plan
from plugin_serdes_ray.testing import arrays_equal, tables_equal


def test_alltypes_container_roundtrip(tmp_path):
    t = generate_alltypes(500)
    plan = build_plan(t.slice(0, 200).combine_chunks())
    path = str(tmp_path / "all.grck")
    metrics = write_partition(t, path, plan.codecs, plan.context())
    out = read_partition(path)
    assert tables_equal(t, out)
    assert metrics["enc_bytes"] < metrics["raw_bytes"]


def test_alltypes_deterministic():
    assert generate_alltypes(100).equals(generate_alltypes(100))


def test_nested_container_roundtrip(tmp_path):
    t = generate_nested(200)
    plan = build_plan(t.combine_chunks())
    path = str(tmp_path / "nested.grck")
    write_partition(t, path, plan.codecs, plan.context())
    out = read_partition(path)
    assert tables_equal(t, out)


def test_alltypes_avro_roundtrip():
    from plugin_serdes_ray.functions.coerce import coerce_table
    from plugin_serdes_ray.sinks.avro_ import table_to_avro_bytes
    from plugin_serdes_ray.sources.avro_ import read_avro_records

    t = generate_alltypes(100)
    # enum (dictionary) columns serialize through their value type
    t = t.set_column(t.schema.get_field_index("enum"), "enum",
                     t.column("enum").cast(pa.string()))
    blob = table_to_avro_bytes(t)
    _, records = read_avro_records(blob)
    back = coerce_table(pa.Table.from_pylist(records), t.schema)
    assert tables_equal(t, back)


def test_alltypes_csv_roundtrip():
    from plugin_serdes_ray.functions.coerce import CoerceOptions, coerce_table
    from plugin_serdes_ray.sinks.csv_ import table_to_csv_bytes
    from plugin_serdes_ray.sources.csv_ import parse_csv_bytes

    cols = ["id", "name", "email", "long", "double", "boolean",
            "timestampMicros"]
    t = generate_alltypes(200).select(cols)
    back = parse_csv_bytes(table_to_csv_bytes(t))
    out = coerce_table(back, t.schema, CoerceOptions(on_bad_lines="ERROR"))
    assert tables_equal(t, out)


# ---------------------------------------------------------------------------
# property tests (hypothesis)
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
                max_size=200))
def test_prop_int_codecs(vals):
    arr = pa.array(vals, type=pa.int64())
    for codec in ["plain", "for", "delta", "rle", "dict"]:
        try:
            blob = encode_array(arr, codec)
        except OverflowError:
            continue  # FoR range guard: selector would route to plain
        assert arrays_equal(decode_array(blob, arr.type), arr), codec


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=40)), max_size=120))
def test_prop_string_codecs(vals):
    arr = pa.array(vals, type=pa.string())
    for codec in ["plain", "fsst", "dict", "dict_fsst"]:
        blob = encode_array(arr, codec)
        assert arrays_equal(decode_array(blob, arr.type), arr), codec


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=64)), max_size=80))
def test_prop_binary_fsst(vals):
    arr = pa.array(vals, type=pa.large_binary())
    blob = encode_array(arr, "fsst")
    assert arrays_equal(decode_array(blob, arr.type), arr)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.floats(allow_nan=True, allow_infinity=True)),
                max_size=100))
def test_prop_float_codecs(vals):
    arr = pa.array(vals, type=pa.float64())
    for codec in ["plain", "rle", "dict"]:
        blob = encode_array(arr, codec)
        assert arrays_equal(decode_array(blob, arr.type), arr), codec


@settings(max_examples=25, deadline=None)
@given(st.binary(max_size=2000))
def test_prop_fsst_stream(data):
    from plugin_serdes_ray.codecs import fsst

    table = fsst.train_table(data[:512])
    assert fsst.decompress(fsst.compress(data, table), table) == data


@settings(max_examples=25, deadline=None)
@given(st.recursive(
    st.one_of(st.none(), st.booleans(),
              st.integers(-(2**53), 2**53),
              st.text(max_size=20)),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=8), children, max_size=4)),
    max_leaves=12))
def test_prop_toon_roundtrip(value):
    from plugin_serdes_ray.functions import toon

    assert toon.decode(toon.encode(value)) == value
