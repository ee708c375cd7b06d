"""Container format + plan selector tests (golden round-trip layer,
modeled on /root/reference avro/infer/fullconversion/
FullIonConversionAbstractTest.java:21-158 — encode -> decode -> identity)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from plugin_serdes_ray.container import (
    ChunkCorruption, chunk_boundaries, partition_codec_report,
    read_partition, write_partition,
)
from plugin_serdes_ray.plan import build_plan, column_stats, merge_stats, shortlist
from plugin_serdes_ray.testing import tables_equal

rng = np.random.default_rng(7)


def _mixed_table(n=5000) -> pa.Table:
    langs = np.array(["en", "de", "fr", "ja"], dtype=object)
    return pa.table({
        "id": pa.array(np.arange(n), type=pa.int64()),
        "ts": pa.array(np.arange(n) * 1000 + rng.integers(0, 100, n), type=pa.timestamp("us")),
        "lang": pa.array(langs[rng.integers(0, 4, n)], type=pa.string()),
        "score": pa.array(rng.random(n)),
        "text": pa.array([f"document body {i % 97} common prefix words" for i in range(n)]),
        "flag": pa.array(rng.random(n) < 0.5),
        "maybe": pa.array([None if i % 7 == 0 else i for i in range(n)], type=pa.int64()),
    })


def test_partition_roundtrip(tmp_path):
    t = _mixed_table()
    plan = build_plan(t.slice(0, 1000).combine_chunks())
    path = str(tmp_path / "p.grck")
    metrics = write_partition(t, path, plan.codecs, plan.context())
    assert metrics["rows"] == t.num_rows
    assert metrics["enc_bytes"] < metrics["raw_bytes"]
    out = read_partition(path)
    assert tables_equal(t, out)


def test_column_pruning(tmp_path):
    t = _mixed_table(500)
    path = str(tmp_path / "p.grck")
    write_partition(t, path, {})
    out = read_partition(path, columns=["lang", "id"])
    assert out.column_names == ["lang", "id"]
    assert tables_equal(t.select(["lang", "id"]), out)


def test_corruption_detected(tmp_path):
    t = _mixed_table(500)
    path = str(tmp_path / "p.grck")
    write_partition(t, path, {"text": "fsst"})
    data = bytearray(open(path, "rb").read())
    data[-10] ^= 0xFF  # flip a byte inside the last chunk payload
    open(path, "wb").write(bytes(data))
    with pytest.raises(ChunkCorruption):
        read_partition(path)


def test_bad_magic(tmp_path):
    path = str(tmp_path / "junk.grck")
    open(path, "wb").write(b"NOTMAGIC" + b"x" * 100)
    with pytest.raises(ChunkCorruption):
        read_partition(path)


def test_codec_report_and_guard(tmp_path):
    t = _mixed_table(2000)
    path = str(tmp_path / "p.grck")
    # deliberately bad plan: rle on random floats — guard must fall back
    write_partition(t, path, {"score": "rle", "lang": "dict_rle"})
    report = partition_codec_report(path)
    assert set(report["score"]) <= {"plain", "rle"}
    out = read_partition(path)
    assert tables_equal(t, out)


def test_chunk_boundaries_bytes_bound():
    big = pa.chunked_array([pa.array([b"x" * 1_000_000] * 40, type=pa.large_binary())])
    spans = chunk_boundaries(big, target_bytes=4 << 20)
    assert len(spans) >= 8  # ~4 rows per chunk at 1MB/row
    assert sum(ln for _, ln in spans) == 40
    small = pa.chunked_array([pa.array(np.arange(1_000_000), type=pa.int64())])
    spans = chunk_boundaries(small)
    assert all(ln <= 1 << 16 for _, ln in spans)


def test_stats_merge_associative():
    t = _mixed_table(3000)
    col = t.column("maybe").combine_chunks()
    full = column_stats(col)
    a = column_stats(col.slice(0, 1000))
    b = column_stats(col.slice(1000, 2000))
    merged = merge_stats(a, b)
    assert merged["n"] == full["n"]
    assert merged["nulls"] == full["nulls"]
    assert merged["min"] == full["min"]
    assert merged["max"] == full["max"]


def test_shortlist_sane():
    n = {"n": 10000, "nulls": 0}
    assert shortlist({**n, "nulls": 10000}, pa.string()) == ["constant"]
    assert shortlist({**n, "distinct": 1}, pa.int64()) == ["constant"]
    sl = shortlist({**n, "distinct": 8, "runs": 9000, "avg_len": 2.0}, pa.string())
    assert "dict" in sl
    sl = shortlist({**n, "distinct": 10000, "runs": 10000, "avg_len": 60.0}, pa.string())
    assert "fsst" in sl
    sl = shortlist({**n, "distinct": 9000, "sorted_frac": 0.99, "min": 0, "max": 10**12, "runs": 10000}, pa.timestamp("us"))
    assert "delta" in sl
    assert shortlist(n, pa.list_(pa.int64())) == ["raw_ipc"]


def test_empty_table_roundtrip(tmp_path):
    t = _mixed_table(0)
    path = str(tmp_path / "empty.grck")
    write_partition(t, path, {})
    out = read_partition(path)
    assert out.num_rows == 0
    assert out.schema == t.schema


# ---------------------------------------------------------------------------
# property test: the FULL selector + container path (plan -> write -> read)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@st.composite
def _gen_table(draw):
    n = draw(st.integers(0, 60))
    cols = {}
    if draw(st.booleans()):
        cols["i"] = pa.array(draw(st.lists(
            st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
            min_size=n, max_size=n)), type=pa.int64())
    if draw(st.booleans()):
        cols["f"] = pa.array(draw(st.lists(
            st.one_of(st.none(),
                      st.floats(allow_nan=True, allow_infinity=True)),
            min_size=n, max_size=n)), type=pa.float64())
    if draw(st.booleans()):
        cols["s"] = pa.array(draw(st.lists(
            st.one_of(st.none(), st.text(max_size=30)),
            min_size=n, max_size=n)), type=pa.string())
    if draw(st.booleans()):
        cols["b"] = pa.array(draw(st.lists(
            st.one_of(st.none(), st.binary(max_size=40)),
            min_size=n, max_size=n)), type=pa.large_binary())
    if not cols:   # at least one column so the table is writable
        cols["ts"] = pa.array(draw(st.lists(
            st.one_of(st.none(), st.integers(-(2**62), 2**62)),
            min_size=n, max_size=n)), type=pa.timestamp("us"))
    return pa.table(cols)


@settings(max_examples=30, deadline=None)
@given(_gen_table())
def test_prop_plan_container_roundtrip(tmp_path_factory, t):
    """decode(encode(T)) == T through the REAL public path: sample-based
    codec auto-selection (incl. the plain-fallback guard), chunked container
    write with framed outer compression + CRC + temporal tags, zero-copy
    read — for arbitrary generated tables incl. empties, all-null columns,
    NaN/inf, giant ints, unicode, and binary."""
    out = str(tmp_path_factory.mktemp("prop")) + "/p.grck"
    plan = build_plan(t)
    write_partition(t, out, plan.codecs, plan.context())
    back = read_partition(out)
    assert tables_equal(t, back)
    # column pruning keeps identity per column
    for name in t.column_names:
        pruned = read_partition(out, [name])
        assert tables_equal(t.select([name]), pruned)


def test_zone_stats_timestamp_outside_datetime_range(tmp_path):
    """Legal Arrow timestamps outside Python datetime's year range must not
    crash the encode (found by the property test: as_py() on the generic
    min/max path raised OverflowError before the int64 temporal branch)."""
    t = pa.table({"ts": pa.array([-(2**62), 0, 2**62],
                                 type=pa.timestamp("us"))})
    plan = build_plan(t)
    out = str(tmp_path / "x.grck")
    m = write_partition(t, out, plan.codecs, plan.context())
    assert m["stats"]["ts"][0] == -(2**62) and m["stats"]["ts"][1] == 2**62
    assert tables_equal(t, read_partition(out))


def test_float_run_heavy_column_gets_rle():
    """column_stats computes runs for FLOAT columns (bit-pattern equality,
    so repeated NaNs form one run) and the float RLE shortlist branch is
    reachable (review r4: it was dead code — run-heavy high-cardinality
    float columns silently lost RLE)."""
    import numpy as np

    vals = np.repeat(np.linspace(0.0, 1.0, 10_000), 10)  # runs/n = 0.1
    col = pa.array(vals, type=pa.float64())
    stats = column_stats(col)
    assert stats["runs"] == 10_000
    sl = shortlist(stats, pa.float64())
    assert "rle" in sl
    # repeated identical NaNs are ONE run under bit-pattern equality
    nan_col = pa.array([float("nan")] * 100, type=pa.float64())
    assert column_stats(nan_col)["runs"] == 1
    # rle is now MEASURED for floats (the branch was dead code — float
    # stats never had a runs key, so runs defaulted to n and the gate
    # never fired); whether it WINS stays a measured decision, since the
    # zstd outer already squeezes repeated patterns out of plain
    rng = np.random.default_rng(7)
    runs_col = pa.array(np.repeat(rng.random(1_000), 100), type=pa.float64())
    plan = build_plan(pa.table({"x": runs_col}))
    assert "rle" in plan.stats["x"]["candidate_sizes"]


def test_plan_sample_not_head_biased():
    """_plan_column's stats/trial sample must cover the WHOLE provided
    sample, not its head (review r4: a head slice meant a corpus whose
    early files are short ASCII and late files are templated HTML planned
    plain for the text column)."""
    import numpy as np

    head = ["ab"] * 45_000
    tail = [("The quick brown fox jumps over the lazy dog %d. " % (i % 7))
            * 12 for i in range(5_000)]
    col = pa.array(head + tail, type=pa.string())
    plan = build_plan(pa.table({"t": col}))
    # with span coverage the sample sees the long templated tail: fsst must
    # at least be TRIED (it was not even shortlisted under the head slice)
    assert "fsst" in plan.stats["t"]["candidate_sizes"]


def test_even_blocks_span_and_adjacency():
    from plugin_serdes_ray.plan import _even_blocks

    col = pa.array(list(range(100_000)), type=pa.int64())
    sub = _even_blocks(col, 2048, block=256)
    vals = sub.to_pylist()
    assert len(vals) <= 2048 + 256
    assert vals[0] < 1000 and vals[-1] > 95_000          # span coverage
    # contiguous blocks: most consecutive deltas are exactly 1
    import numpy as np

    d = np.diff(np.asarray(vals))
    assert (d == 1).mean() > 0.9
