"""CDC merge/upsert: broadcast and shuffle paths, LWW versions, deletes."""

import numpy as np
import pyarrow as pa
import pytest


def _snap():
    return pa.table({
        "k": pa.array([1, 2, 2, 3, 4, None], type=pa.int64()),
        "v": ["a", "b1", "b2", "c", "d", "nullkey"],
    })


def _run(ds):
    t = pa.Table.from_pylist(ds.take_all())
    return sorted(zip(t.column("k").to_pylist(), t.column("v").to_pylist()),
                  key=lambda r: (r[0] is None, r[0], r[1]))


def _both(snapshot_tbl, delta_tbl, key, **kw):
    """Run broadcast and shuffle paths on the same inputs; assert they
    agree; return the (sorted) rows."""
    import ray.data

    from plugin_serdes_ray.pipelines.merge import (broadcast_merge,
                                                   merge_changes)

    b = _run(broadcast_merge(ray.data.from_arrow(snapshot_tbl), delta_tbl,
                             key, **kw))
    s = _run(merge_changes(ray.data.from_arrow(snapshot_tbl),
                           ray.data.from_arrow(delta_tbl), key, **kw))
    assert b == s
    return b


def test_merge_upsert_delete_insert(ray_session):
    delta = pa.table({
        "k": pa.array([2, 3, 9], type=pa.int64()),
        "v": ["B", "ignored", "new"],
        "op": ["upsert", "delete", "upsert"],
    })
    got = _both(_snap(), delta, "k", op_column="op")
    # k=1 untouched; BOTH k=2 snapshot rows replaced by ONE winner;
    # k=3 deleted; k=4 untouched; null-key row passes through; k=9 inserted
    assert got == [(1, "a"), (2, "B"), (4, "d"), (9, "new"),
                   (None, "nullkey")]


def test_merge_last_writer_wins_version(ray_session):
    delta = pa.table({
        "k": pa.array([2, 2, 4, 4], type=pa.int64()),
        "v": ["old", "NEW", "del-late", "keep-early"],
        "op": ["upsert", "upsert", "delete", "upsert"],
        "ver": pa.array([1, 7, 9, 3], type=pa.int64()),
    })
    got = _both(_snap(), delta, "k", op_column="op", version_column="ver")
    # k=2: version 7 upsert wins; k=4: version 9 DELETE wins over the
    # earlier upsert
    assert got == [(1, "a"), (2, "NEW"), (3, "c"), (None, "nullkey")]


def test_merge_ambiguous_raises(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.merge import (broadcast_merge,
                                                   merge_changes)

    # no version column, two rows for one key
    dup = pa.table({"k": pa.array([2, 2], type=pa.int64()),
                    "v": ["x", "y"]})
    with pytest.raises(ValueError, match="ambiguous"):
        broadcast_merge(ray.data.from_arrow(_snap()), dup, "k")
    with pytest.raises((ValueError, Exception), match="ambiguous"):
        merge_changes(ray.data.from_arrow(_snap()),
                      ray.data.from_arrow(dup), "k").take_all()
    # tied max version
    tied = pa.table({"k": pa.array([2, 2], type=pa.int64()),
                     "v": ["x", "y"],
                     "ver": pa.array([5, 5], type=pa.int64())})
    with pytest.raises(ValueError, match="max version"):
        broadcast_merge(ray.data.from_arrow(_snap()), tied, "k",
                        version_column="ver")
    with pytest.raises(Exception, match="max version"):
        merge_changes(ray.data.from_arrow(_snap()),
                      ray.data.from_arrow(tied), "k",
                      version_column="ver").take_all()


def test_merge_null_delta_key_and_bad_op_raise(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.merge import (broadcast_merge,
                                                   merge_changes)

    nullkey = pa.table({"k": pa.array([None], type=pa.int64()),
                        "v": ["x"]})
    with pytest.raises(ValueError, match="null merge keys"):
        broadcast_merge(ray.data.from_arrow(_snap()), nullkey, "k")
    with pytest.raises(Exception, match="null merge keys"):
        merge_changes(ray.data.from_arrow(_snap()),
                      ray.data.from_arrow(nullkey), "k").take_all()
    badop = pa.table({"k": pa.array([2], type=pa.int64()),
                      "v": ["x"], "op": ["replace"]})
    with pytest.raises(ValueError, match="op column"):
        broadcast_merge(ray.data.from_arrow(_snap()), badop, "k",
                        op_column="op")
    with pytest.raises(Exception, match="op column"):
        merge_changes(ray.data.from_arrow(_snap()),
                      ray.data.from_arrow(badop), "k",
                      op_column="op").take_all()


def test_merge_composite_and_hash_collision_keys(ray_session):
    # string keys containing '#': the routing key for ('a', 'b#c') and
    # ('a#b', 'c') collides — the resolve stage must still treat them as
    # distinct keys (hash_join convention)
    snap = pa.table({
        "k1": ["a", "a#b", "x"],
        "k2": ["b#c", "c", "y"],
        "v": ["one", "two", "three"],
    })
    delta = pa.table({
        "k1": ["a"], "k2": ["b#c"], "v": ["ONE"], "op": ["upsert"],
    })
    import ray.data

    from plugin_serdes_ray.pipelines.merge import (broadcast_merge,
                                                   merge_changes)

    for out in (
        broadcast_merge(ray.data.from_arrow(snap), delta, ["k1", "k2"],
                        op_column="op"),
        merge_changes(ray.data.from_arrow(snap),
                      ray.data.from_arrow(delta), ["k1", "k2"],
                      op_column="op"),
    ):
        t = pa.Table.from_pylist(out.take_all())
        rows = sorted(zip(t.column("k1").to_pylist(),
                          t.column("k2").to_pylist(),
                          t.column("v").to_pylist()))
        assert rows == [("a", "b#c", "ONE"), ("a#b", "c", "two"),
                        ("x", "y", "three")]


def test_merge_casts_delta_key_types_and_empty_delta(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.merge import (broadcast_merge,
                                                   merge_changes)

    delta32 = pa.table({"k": pa.array([2], type=pa.int32()), "v": ["B"]})
    got = _both(_snap(), delta32, "k")
    assert got == [(1, "a"), (2, "B"), (3, "c"), (4, "d"),
                   (None, "nullkey")]
    # empty delta: snapshot unchanged on both paths
    empty = pa.table({"k": pa.array([], type=pa.int64()),
                      "v": pa.array([], type=pa.string())})
    b = broadcast_merge(ray.data.from_arrow(_snap()), empty, "k")
    assert _run(b) == _run(ray.data.from_arrow(_snap()))
    s = merge_changes(ray.data.from_arrow(_snap()),
                      ray.data.from_arrow(empty), "k")
    assert _run(s) == _run(ray.data.from_arrow(_snap()))


def test_merge_bloom_prefilter_equivalence(ray_session):
    """The delta-key Bloom prefilter must be invisible in the result:
    bloom on (default) == bloom off (full shuffle) on data with nulls,
    dup keys, deletes, and versions."""
    import ray.data

    from plugin_serdes_ray.pipelines.merge import merge_changes

    rng = np.random.default_rng(4)
    n = 300
    k = rng.integers(0, 120, n).astype(object)
    k[rng.random(n) < 0.1] = None
    snap = pa.table({"k": pa.array(list(k), type=pa.int64()),
                     "v": pa.array([f"s{i}" for i in range(n)])})
    delta = pa.table({
        "k": pa.array([3, 3, 50, 999], type=pa.int64()),
        "v": ["old", "NEW", "del", "ins"],
        "op": ["upsert", "upsert", "delete", "upsert"],
        "ver": pa.array([1, 2, 1, 1], type=pa.int64())})
    kw = dict(op_column="op", version_column="ver")
    on = _run(merge_changes(ray.data.from_arrow(snap).repartition(5),
                            ray.data.from_arrow(delta), "k", **kw))
    off = _run(merge_changes(ray.data.from_arrow(snap).repartition(5),
                             ray.data.from_arrow(delta), "k",
                             bloom_bits=None, **kw))
    assert on == off
    assert (999, "ins") in on and all(r[0] != 50 for r in on)
    import pytest
    with pytest.raises(ValueError, match="bloom_bits"):
        merge_changes(ray.data.from_arrow(snap),
                      ray.data.from_arrow(delta), "k", bloom_bits=100,
                      **kw)


def test_cli_merge_both_paths(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from plugin_serdes_ray.__main__ import main

    snap_p = str(tmp_path / "snap.parquet")
    delta_p = str(tmp_path / "delta.parquet")
    pq.write_table(pa.table({
        "k": pa.array([1, 2, 3], type=pa.int64()),
        "v": ["a", "b", "c"]}), snap_p)
    pq.write_table(pa.table({
        "k": pa.array([2, 9], type=pa.int64()),
        "v": ["B", "new"],
        "op": ["delete", "upsert"]}), delta_p)
    for extra, name in (([], "out1.parquet"),
                        (["--broadcast"], "out2.parquet")):
        out = str(tmp_path / name)
        assert main(["merge", snap_p, delta_p, "--key", "k",
                     "--op", "op", "--output", out] + extra) == 0
        t = pq.read_table(out)
        rows = sorted(zip(t.column("k").to_pylist(),
                          t.column("v").to_pylist()))
        assert rows == [(1, "a"), (3, "c"), (9, "new")]


def test_merge_randomized_vs_python(ray_session):
    """Randomized: both paths == a straightforward driver-side reference
    implementation, across seeds with inserts/updates/deletes/versions."""
    import ray.data

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = 200
        snap_k = rng.integers(0, 80, n)
        snap = pa.table({
            "k": pa.array(snap_k, type=pa.int64()),
            "v": pa.array([f"s{seed}-{i}" for i in range(n)]),
        })
        m = 60
        dk = rng.choice(120, size=m, replace=False)  # unique keys
        ops = np.where(rng.random(m) < 0.3, "delete", "upsert")
        delta = pa.table({
            "k": pa.array(dk, type=pa.int64()),
            "v": pa.array([f"d{seed}-{i}" for i in range(m)]),
            "op": pa.array(ops.astype(object), type=pa.string()),
        })
        # reference: matched snapshot rows all vanish; each upsert winner
        # appears exactly once (replacement or insert); deletes vanish
        dmap = {int(k): (o, v) for k, o, v in
                zip(dk, ops, delta.column("v").to_pylist())}
        want = [(int(k), v) for k, v in
                zip(snap_k, snap.column("v").to_pylist())
                if int(k) not in dmap]
        want += [(k, v) for k, (o, v) in dmap.items() if o == "upsert"]
        got = _both(snap, delta, "k", op_column="op")
        assert got == sorted(want), seed
