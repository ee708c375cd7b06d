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


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=24)), max_size=30))
def test_prop_jsonl_string_roundtrip(texts):
    """JSONL is a lossless text container: arbitrary unicode strings (incl.
    newlines, quotes, U+2028-class separators, control chars) round-trip
    exactly through the sink+source pair."""
    from plugin_serdes_ray.sinks.json_ import table_to_json_bytes
    from plugin_serdes_ray.sources.json_ import parse_json_bytes

    t = pa.table({"s": pa.array(texts, pa.string()),
                  "i": pa.array(range(len(texts)), pa.int64())})
    recs = parse_json_bytes(table_to_json_bytes(t))
    assert [r["s"] for r in recs] == texts
    assert [r["i"] for r in recs] == list(range(len(texts)))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=20)), max_size=25))
def test_prop_csv_string_roundtrip(texts):
    """CSV round-trip identity for strings OUTSIDE the designed-lossy set
    (the reference's nullValues list maps '', 'NA', 'NaN', ... to null by
    design; everything else — quotes, separators, unicode — must survive).
    Newlines/CR are excluded: the reference's row-per-line model cannot
    represent them."""
    from hypothesis import assume

    from plugin_serdes_ray.functions.coerce import (CoerceOptions,
                                                     NULL_VALUES,
                                                     coerce_table)
    from plugin_serdes_ray.sinks.csv_ import table_to_csv_bytes
    from plugin_serdes_ray.sources.csv_ import parse_csv_bytes

    assume(all(v is None or (v not in NULL_VALUES
                             and "\n" not in v and "\r" not in v
                             and v == v.strip())
               for v in texts))
    # avoid all-null/empty tables (schema inference has nothing to go on)
    assume(any(v for v in texts))
    # pair with an always-present column: a row whose every cell is null
    # writes an EMPTY LINE, which skip_empty_rows (reference semantics)
    # drops by design — single-column all-null rows are designed-lossy
    t = pa.table({"s": pa.array(texts, pa.string()),
                  "i": pa.array(range(len(texts)), pa.int64())})
    back = parse_csv_bytes(table_to_csv_bytes(t))
    out = coerce_table(back, t.schema, CoerceOptions(on_bad_lines="ERROR"))
    assert tables_equal(t, out)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=20)), max_size=15))
def test_prop_yaml_roundtrip(texts):
    from plugin_serdes_ray.sinks.yaml_ import records_to_yaml
    from plugin_serdes_ray.sources.yaml_ import parse_yaml_bytes

    recs = [{"s": v, "i": i} for i, v in enumerate(texts)]
    assert parse_yaml_bytes(records_to_yaml(recs).encode()) == recs


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=60))
def test_prop_html_md_text_identity(t):
    """Whitespace-collapsed byte identity of html -> markdown -> text for
    ARBITRARY unicode payloads (property form of the escape-layer tests:
    markdown specials, entities, brackets, backslashes all round-trip)."""
    import html as _html

    from plugin_serdes_ray.functions.markdown import (html_to_markdown,
                                                      markdown_to_text)

    page = f"<html><body><article><p>{_html.escape(t)}</p></article></body></html>"
    got = " ".join(markdown_to_text(html_to_markdown(page)).split())
    assert got == " ".join(t.split())


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
                max_size=40))
def test_prop_coerce_int_string_identity(vals):
    """to_int(str(v)) == v for every representable int64 (the string path
    must not lose precision through its pandas hop)."""
    from plugin_serdes_ray.functions.coerce import to_int

    s = pa.array([None if v is None else str(v) for v in vals], pa.string())
    out = to_int(s, pa.int64())
    assert out.to_pylist() == vals


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.integers(-(2**52), 2**52)),   # epoch ms range
                max_size=30))
def test_prop_coerce_timestamp_int_string_parity(vals):
    """Integer epoch-millis and their string forms coerce to the SAME
    timestamps for every unit (SKIP policy: ms values that overflow the
    ns unit must policy-fail identically on both paths)."""
    from plugin_serdes_ray.functions.coerce import CoerceOptions, to_timestamp
    from plugin_serdes_ray.functions.errors import OnBadLines

    skip = CoerceOptions(on_bad_lines=OnBadLines.SKIP)
    ints = pa.array(vals, pa.int64())
    strs = pa.array([None if v is None else str(v) for v in vals],
                    pa.string())
    for unit in ("s", "ms", "us", "ns"):
        a = to_timestamp(ints, unit=unit, opts=skip)
        b = to_timestamp(strs, unit=unit, opts=skip)
        # compare as int64 storage: to_pylist() boxes through Python
        # datetime, which cannot represent years < 1 / > 9999
        assert a.cast(pa.int64()).to_pylist() == \
            b.cast(pa.int64()).to_pylist(), unit


def test_coerce_timestamp_overflow_and_floor_semantics():
    """Three review-confirmed defects stay fixed: (1) epoch-ms beyond the
    target unit's int64 range policy-fails instead of wrapping into a
    valid-looking garbage timestamp; (2) all-digit strings above int64 max
    policy-fail instead of ArrowInvalid aborting the batch; (3) pre-epoch
    sub-unit values floor to the previous whole unit, not up toward the
    epoch. Both the integer input path and the string fast path."""
    from plugin_serdes_ray.functions.coerce import CoerceOptions, to_timestamp
    from plugin_serdes_ray.functions.errors import BadLineError, OnBadLines

    skip = CoerceOptions(on_bad_lines=OnBadLines.SKIP)
    # (1) 1e13 ms = year 2286, not representable in ns
    assert to_timestamp(pa.array(["10000000000000"]), unit="ns",
                        opts=skip).to_pylist() == [None]
    assert to_timestamp(pa.array([10**13], pa.int64()), unit="ns",
                        opts=skip).to_pylist() == [None]
    with pytest.raises(BadLineError):
        to_timestamp(pa.array(["10000000000000"]), unit="ns")
    # (2) above int64 max: policy failure, not an aborting ArrowInvalid
    assert to_timestamp(pa.array(["9223372036854775808"]), unit="ms",
                        opts=skip).to_pylist() == [None]
    # (3) floor toward -inf on scale-down, all three routes
    import datetime as dt

    want = dt.datetime(1969, 12, 31, 23, 59, 59)
    assert to_timestamp(pa.array(["1969-12-31T23:59:59.4"]), unit="s",
                        opts=skip).to_pylist() == [want]
    assert to_timestamp(pa.array(["-600"]), unit="s",
                        opts=skip).to_pylist() == [want]
    assert to_timestamp(pa.array([-600], pa.int64()), unit="s",
                        opts=skip).to_pylist() == [want]


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.fixed_dictionaries({
        "i": st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
        "s": st.one_of(st.none(), st.text(max_size=16)),
        "b": st.one_of(st.none(), st.binary(max_size=12)),
        "f": st.one_of(st.none(), st.floats(allow_nan=False,
                                            allow_infinity=False)),
    }), max_size=20))
def test_prop_avro_container_roundtrip(records):
    """write_container/read_container identity for generated records over a
    nullable-union schema (ints, unicode strings, bytes, doubles)."""
    from plugin_serdes_ray.functions import avroio

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "i", "type": ["null", "int"]},
        {"name": "s", "type": ["null", "string"]},
        {"name": "b", "type": ["null", "bytes"]},
        {"name": "f", "type": ["null", "double"]},
    ]}
    _, out = avroio.read_container(avroio.write_container(records, schema))
    assert out == records


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=20)), max_size=12))
def test_prop_xml_table_roundtrip(texts):
    """Table-level XML write/read identity — including 0- and 1-row tables
    (the generic parse is reference-faithfully ambiguous there; the table
    reader unwraps by shape) — for arbitrary text EXCEPT control chars
    (illegal in XML 1.0) and whitespace-only values (text nodes strip)."""
    import tempfile

    from hypothesis import assume

    from plugin_serdes_ray.sinks.xml_ import table_to_xml_bytes
    from plugin_serdes_ray.sources.xml_ import read_xml_table

    def xml_ok(v):
        return v is None or (
            v.strip() == v and v != "" and
            all(c >= " " or c == "\t" for c in v))

    assume(all(xml_ok(v) for v in texts))
    t = pa.table({"s": pa.array(texts, pa.string()),
                  "i": pa.array(range(len(texts)), pa.int64())})
    with tempfile.NamedTemporaryFile(suffix=".xml") as f:
        f.write(table_to_xml_bytes(t))
        f.flush()
        got = read_xml_table(f.name)
    assert got.num_rows == len(texts)
    if len(texts):
        # leaf text is type-inferred; compare stringified, None for null
        gs = got.column("s").to_pylist()
        assert [None if v is None else str(v) for v in gs] == texts
        assert [int(v) for v in got.column("i").to_pylist()] == \
            list(range(len(texts)))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=16)), max_size=10),
       st.lists(st.one_of(st.none(),
                          st.integers(-(2**52), 2**52),
                          st.floats(allow_nan=False, allow_infinity=False,
                                    width=32)),
                max_size=10))
def test_prop_xlsx_roundtrip(texts, nums):
    """xlsx write/read identity: shared-string escaping, typed numeric
    cells, and nulls for arbitrary payloads (strings keep their type even
    when they look numeric — cells are typed, unlike CSV)."""
    from hypothesis import assume

    from plugin_serdes_ray.sinks.excel_ import tables_to_xlsx_bytes
    from plugin_serdes_ray.sources.excel_ import read_xlsx_bytes

    n = min(len(texts), len(nums))
    texts, nums = texts[:n], nums[:n]
    # xlsx shared strings trim nothing, but control chars are illegal in
    # the underlying XML (designed-lossy, same as the XML sink)
    assume(all(v is None or all(c >= " " or c in "\t" for c in v)
               for v in texts))
    assume(any(v is not None for v in texts) or n == 0)
    # an all-null row writes an EMPTY sheet row, which skip_empty_rows
    # (reference semantics) drops by design — keep one always-present
    # column so every row is observable
    t = pa.table({"s": pa.array(texts, pa.string()),
                  "x": pa.array(nums, pa.float64()),
                  "k": pa.array(range(len(texts)), pa.int64())})
    got = read_xlsx_bytes(tables_to_xlsx_bytes({"S": t}))["S"]
    assert got.column("k").to_pylist() == list(range(len(texts)))
    assert [None if v is None else str(v)
            for v in got.column("s").to_pylist()] == texts
    for want, g in zip(nums, got.column("x").to_pylist()):
        if want is None:
            assert g is None
        else:
            assert g is not None and float(g) == float(want)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(max_size=16), min_size=1, max_size=12),
       st.sampled_from([",", ";", "|", "\t"]),
       st.sampled_from(["ALWAYS", "REQUIRED", "NON_NUMERIC"]))
def test_prop_csv_dialect_matrix(texts, sep, quote_mode):
    """CSV identity across separators x quote modes for text containing
    the separator/quote chars themselves (outside the designed-lossy set:
    nullValues, embedded newlines, NON_NUMERIC's numeric-looking strings
    which are intentionally written unquoted and re-typed)."""
    from hypothesis import assume

    from plugin_serdes_ray.functions.coerce import (CoerceOptions,
                                                    NULL_VALUES,
                                                    coerce_table)
    from plugin_serdes_ray.sinks.csv_ import (CsvWriteOptions,
                                              table_to_csv_bytes)
    from plugin_serdes_ray.sources.csv_ import CsvOptions, parse_csv_bytes

    def losslessly_csv(v):
        if v in NULL_VALUES or v != v.strip():
            return False
        if "\n" in v or "\r" in v:
            return False
        if quote_mode == "NON_NUMERIC":
            # numeric-looking strings are written unquoted by design
            body = v[1:] if v[:1] in "+-" else v
            if body and body.replace(".", "", 1).isdigit():
                return False
        return True

    assume(all(losslessly_csv(v) for v in texts))
    t = pa.table({"s": pa.array(texts, pa.string()),
                  "i": pa.array(range(len(texts)), pa.int64())})
    blob = table_to_csv_bytes(t, CsvWriteOptions(field_separator=sep,
                                                 quote_mode=quote_mode))
    back = parse_csv_bytes(blob, CsvOptions(field_separator=sep))
    out = coerce_table(back, t.schema, CoerceOptions(on_bad_lines="ERROR"))
    assert tables_equal(t, out)


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.fixed_dictionaries({
        "i": st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
        "s": st.one_of(st.none(), st.text(max_size=16)),
        "b": st.one_of(st.none(), st.binary(max_size=12)),
    }), max_size=15))
def test_prop_protobuf_roundtrip(records):
    """Length-delimited protobuf stream roundtrip for generated records
    (proto2 explicit presence: zeros and None both survive)."""
    from plugin_serdes_ray.sources.protobuf_ import (
        descriptor_set_for_schema, parse_protobuf_bytes, serialize_protobuf,
    )

    schema = pa.schema([pa.field("i", pa.int64()),
                        pa.field("s", pa.string()),
                        pa.field("b", pa.binary())])
    dset = descriptor_set_for_schema(schema, message="M", package="t")
    blob = serialize_protobuf(records, dset, "t.M")
    out = parse_protobuf_bytes(blob, dset, "t.M")
    assert len(out) == len(records)
    for want, got in zip(records, out):
        for k in ("i", "s", "b"):
            g = got.get(k)
            if k == "i" and g is not None:
                g = int(g)
            assert g == want[k], (k, want, got)


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.fixed_dictionaries({
        "a": st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
        "b": st.one_of(st.none(), st.text(max_size=12)),
        "c": st.one_of(st.none(), st.booleans()),
        # a genuinely UNION-typed field (long | string across rows)
        "u": st.one_of(st.none(), st.integers(-(2**31), 2**31),
                       st.text(max_size=8)),
    }), max_size=15))
def test_prop_infer_then_avro_roundtrip(rows):
    """Composition property: schema INFERENCE over arbitrary rows (incl. a
    field whose type varies row to row -> union merge) must produce a
    schema the avro container writer accepts, and the written records must
    read back exactly."""
    from plugin_serdes_ray.functions import avroio
    from plugin_serdes_ray.functions.infer import infer_rows, to_avro

    root = infer_rows(rows, infer_all_fields=True)
    schema = to_avro(root, "root")
    if isinstance(schema, list):
        schema = next(s for s in schema if s != "null")
    blob = avroio.write_container(rows, schema)
    _, out = avroio.read_container(blob)
    assert out == rows
