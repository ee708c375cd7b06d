"""Bounded randomized stress tests of the wide ops against DuckDB/numpy on
adversarial inputs (null keys, duplicate keys, ties, skew) beyond what the
fixed fixtures exercise. Seeded numpy generation — deterministic, a handful
of draws per op so the whole file stays under a minute."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _rand_table(rng, n, key_space, with_nulls=True):
    keys = rng.integers(0, key_space, n)
    vals = rng.integers(-1000, 1000, n)
    k = keys.astype(object)
    if with_nulls and n:
        k[rng.random(n) < 0.15] = None
    return pa.table({"k": pa.array(list(k), type=pa.int64()),
                     "v": pa.array(vals, type=pa.int64())})


def _sorted_rows(rows, cols):
    # multiset compare (None is unorderable in a plain sort)
    from collections import Counter

    return Counter(tuple(r.get(c) for c in cols) for r in rows)


@pytest.mark.parametrize("join_type", ["inner", "left", "right", "full"])
def test_random_hash_join_vs_duckdb(ray_session, join_type):
    import ray.data

    from plugin_serdes_ray.pipelines.relational import hash_join

    con = duckdb.connect()
    sql = {"inner": "JOIN", "left": "LEFT JOIN",
           "right": "RIGHT JOIN", "full": "FULL JOIN"}[join_type]
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        lt = _rand_table(rng, int(rng.integers(0, 80)), 10)
        rt = _rand_table(rng, int(rng.integers(1, 80)), 10)
        got = hash_join(ray.data.from_arrow(lt).repartition(3),
                        ray.data.from_arrow(rt).repartition(3),
                        key="k", join_type=join_type).take_all()
        con.register("l", lt)
        con.register("r", rt)
        want = con.execute(
            f"SELECT coalesce(l.k, r.k) AS k, l.v AS v, r.v AS v_r "
            f"FROM l {sql} r ON l.k = r.k").arrow().to_pylist()
        assert _sorted_rows(got, ["k", "v", "v_r"]) == \
            _sorted_rows(want, ["k", "v", "v_r"]), (join_type, seed)


def test_random_window_functions_vs_duckdb(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.relational import window_functions

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 120))
        t = pa.table({
            "g": pa.array(rng.integers(0, 5, n), type=pa.int64()),
            # UNIQUE order key per group (SQL determinism), tied VALUES
            "o": pa.array(np.arange(n), type=pa.int64()),
            "x": pa.array(rng.integers(0, 4, n), type=pa.int64()),
        })
        got = window_functions(
            ray.data.from_arrow(t).repartition(3), "g", "o",
            {"rn": ("row_number",), "rk": ("rank", "x"),
             "dr": ("dense_rank", "x"), "cs": ("cumsum", "x"),
             "lg": ("lag", "x")}).take_all()
        want = con.execute("""
            SELECT g, o, x,
                   row_number() OVER w AS rn,
                   rank() OVER (PARTITION BY g ORDER BY x) AS rk,
                   dense_rank() OVER (PARTITION BY g ORDER BY x) AS dr,
                   sum(x) OVER (PARTITION BY g ORDER BY o
                                ROWS UNBOUNDED PRECEDING) AS cs,
                   lag(x) OVER w AS lg
            FROM t WINDOW w AS (PARTITION BY g ORDER BY o)
        """).arrow().to_pylist()
        cols = ["g", "o", "x", "rn", "rk", "dr", "cs", "lg"]
        assert _sorted_rows(got, cols) == _sorted_rows(want, cols), seed
        con.unregister("t") if hasattr(con, "unregister") else None


def test_random_quantiles_vs_duckdb(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.relational import (exact_quantiles,
                                                        exact_quantiles_cont)

    con = duckdb.connect()
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 300))
        # heavy ties: values drawn from a tiny domain
        vals = rng.integers(0, 7, n)
        t = pa.table({"x": pa.array(vals, type=pa.int64())})
        ds = ray.data.from_arrow(t).repartition(4)
        disc = exact_quantiles(ds, "x", qs)
        cont = exact_quantiles_cont(ds, "x", qs)
        con.register("t", t)
        for q in qs:
            wd = con.execute(
                f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
            wc = con.execute(
                f"SELECT quantile_cont(x, {q}) FROM t").fetchone()[0]
            assert disc[q] == wd, (seed, q)
            assert cont[q] == pytest.approx(float(wc)), (seed, q)


def test_random_rollup_null_keys_vs_duckdb(ray_session):
    """ROLLUP over keys CONTAINING NULLS: count(*) must include null-key
    rows at every level (ADVICE r4: only null-free fixtures were covered)."""
    import ray.data

    from plugin_serdes_ray.pipelines.relational import rollup_aggregate

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 150))
        a = rng.integers(0, 3, n).astype(object)
        b = rng.integers(0, 3, n).astype(object)
        a[rng.random(n) < 0.2] = None
        b[rng.random(n) < 0.2] = None
        t = pa.table({"a": pa.array(list(a), type=pa.int64()),
                      "b": pa.array(list(b), type=pa.int64()),
                      "v": pa.array(rng.integers(0, 100, n),
                                    type=pa.int64())})
        got = rollup_aggregate(ray.data.from_arrow(t).repartition(3),
                               ["a", "b"], sum_cols=["v"]).take_all()
        con.register("t", t)
        want = con.execute("""
            SELECT a, b, sum(v) AS sum_v, count(*) AS n,
                   grouping(a) AS ga, grouping(b) AS gb
            FROM t GROUP BY ROLLUP(a, b)""").arrow().to_pylist()
        # a real NULL key and a rolled-up level are distinguished by the
        # grouping markers; compare on the common shape
        gset = _sorted_rows(got, ["a", "b", "sum_v", "n"])
        wset = _sorted_rows(
            [{"a": r["a"], "b": r["b"], "sum_v": r["sum_v"], "n": r["n"]}
             for r in want], ["a", "b", "sum_v", "n"])
        assert gset == wset, seed


def test_random_grouped_means_null_values_vs_duckdb(ray_session):
    """AVG semantics with null VALUES (contribute to neither sum nor
    denominator) and null KEYS, vs DuckDB."""
    import ray.data

    from plugin_serdes_ray.pipelines.relational import grouped_aggregate

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 150))
        k = rng.integers(0, 4, n).astype(object)
        v = rng.integers(0, 100, n).astype(object)
        k[rng.random(n) < 0.2] = None
        v[rng.random(n) < 0.3] = None
        t = pa.table({"k": pa.array(list(k), type=pa.int64()),
                      "v": pa.array(list(v), type=pa.int64())})
        got = grouped_aggregate(ray.data.from_arrow(t).repartition(3),
                                ["k"], sum_cols=["v"],
                                mean_cols=["v"]).take_all()
        con.register("t", t)
        want = con.execute(
            "SELECT k, sum(v) AS sum_v, count(*) AS n, avg(v) AS mean_v "
            "FROM t GROUP BY k").arrow().to_pylist()
        g = {r["k"]: (r["sum_v"], r["n"], r["mean_v"]) for r in got}
        w = {r["k"]: (r["sum_v"], r["n"],
                      None if r["mean_v"] is None else float(r["mean_v"]))
             for r in want}
        assert set(g) == set(w), seed
        for key in w:
            assert g[key][0] == w[key][0], (seed, key)
            assert g[key][1] == w[key][1], (seed, key)
            gm, wm = g[key][2], w[key][2]
            assert (gm is None) == (wm is None), (seed, key)
            if gm is not None:
                assert gm == pytest.approx(wm), (seed, key)


def test_random_semi_anti_vs_duckdb(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.relational import semi_join

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        lt = _rand_table(rng, int(rng.integers(1, 100)), 12)
        rt = _rand_table(rng, int(rng.integers(1, 100)), 12)
        con.register("l", lt)
        con.register("r", rt)
        got_s = semi_join(ray.data.from_arrow(lt).repartition(3),
                          ray.data.from_arrow(rt).repartition(3),
                          "k").take_all()
        want_s = con.execute(
            "SELECT * FROM l WHERE EXISTS "
            "(SELECT 1 FROM r WHERE r.k = l.k)").arrow().to_pylist()
        assert _sorted_rows(got_s, ["k", "v"]) == \
            _sorted_rows(want_s, ["k", "v"]), ("semi", seed)
        got_a = semi_join(ray.data.from_arrow(lt).repartition(3),
                          ray.data.from_arrow(rt).repartition(3),
                          "k", anti=True).take_all()
        want_a = con.execute(
            "SELECT * FROM l WHERE NOT EXISTS "
            "(SELECT 1 FROM r WHERE r.k = l.k)").arrow().to_pylist()
        assert _sorted_rows(got_a, ["k", "v"]) == \
            _sorted_rows(want_a, ["k", "v"]), ("anti", seed)


def test_random_asof_join_vs_duckdb(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.relational import asof_join

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        nl, nr = int(rng.integers(1, 80)), int(rng.integers(1, 80))
        lt = pa.table({
            "u": pa.array(rng.integers(0, 4, nl), type=pa.int64()),
            "ts": pa.array(rng.integers(0, 50, nl), type=pa.int64()),
            "lv": pa.array(np.arange(nl), type=pa.int64())})
        rt = pa.table({
            "u": pa.array(rng.integers(0, 4, nr), type=pa.int64()),
            # UNIQUE (u, ts) on the right: SQL ASOF is otherwise
            # nondeterministic about which tied row wins
            "ts": pa.array(rng.permutation(np.arange(nr)) % 50,
                           type=pa.int64()),
            "rv": pa.array(np.arange(nr), type=pa.int64())})
        rt = pa.Table.from_pylist(
            list({(r["u"], r["ts"]): r for r in rt.to_pylist()}.values()))
        for jt, sql in (("inner", "ASOF JOIN"), ("left", "ASOF LEFT JOIN")):
            got = asof_join(ray.data.from_arrow(lt).repartition(3),
                            ray.data.from_arrow(rt).repartition(3),
                            on="ts", by="u", join_type=jt).take_all()
            con.register("l", lt)
            con.register("r", rt)
            want = con.execute(
                f"SELECT l.u, l.ts, l.lv, r.rv FROM l {sql} r "
                f"ON l.u = r.u AND l.ts >= r.ts").arrow().to_pylist()
            assert _sorted_rows(got, ["u", "ts", "lv", "rv"]) == \
                _sorted_rows(want, ["u", "ts", "lv", "rv"]), (jt, seed)


def test_random_set_ops_vs_duckdb(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.relational import set_op

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        lt = _rand_table(rng, int(rng.integers(1, 80)), 5)
        rt = _rand_table(rng, int(rng.integers(1, 80)), 5)
        # shrink the value domain so row-level overlaps actually occur
        lt = lt.set_column(1, "v", pa.array(
            np.asarray(lt.column("v")) % 3, type=pa.int64()))
        rt = rt.set_column(1, "v", pa.array(
            np.asarray(rt.column("v")) % 3, type=pa.int64()))
        con.register("l", lt)
        con.register("r", rt)
        for op, sql in (("union", "UNION"), ("except", "EXCEPT"),
                        ("intersect", "INTERSECT")):
            got = set_op(ray.data.from_arrow(lt).repartition(3),
                         ray.data.from_arrow(rt).repartition(3),
                         op).take_all()
            want = con.execute(
                f"SELECT * FROM l {sql} SELECT * FROM r").arrow().to_pylist()
            assert _sorted_rows(got, ["k", "v"]) == \
                _sorted_rows(want, ["k", "v"]), (op, seed)


def test_random_string_agg_vs_duckdb(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.relational import string_agg

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 100))
        k = rng.integers(0, 4, n)
        s = np.array([f"w{int(x)}" for x in rng.integers(0, 9, n)],
                     dtype=object)
        s[rng.random(n) < 0.2] = None
        t = pa.table({"k": pa.array(k, type=pa.int64()),
                      "s": pa.array(list(s), type=pa.string()),
                      "o": pa.array(np.arange(n), type=pa.int64())})
        got = string_agg(ray.data.from_arrow(t).repartition(3),
                         "k", "s", sep="|", order_by="o").take_all()
        con.register("t", t)
        want = con.execute(
            "SELECT k, string_agg(s, '|' ORDER BY o) AS agg "
            "FROM t GROUP BY k").arrow().to_pylist()
        assert {r["k"]: r["agg"] for r in got} == \
            {r["k"]: r["agg"] for r in want}, seed


def test_random_grouped_top_k_vs_duckdb(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.relational import grouped_top_k

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 120))
        t = pa.table({
            "k": pa.array(rng.integers(0, 4, n), type=pa.int64()),
            "x": pa.array(rng.integers(0, 6, n), type=pa.int64()),
            "id": pa.array(np.arange(n), type=pa.int64()),  # unique tiebreak
        })
        got = grouped_top_k(ray.data.from_arrow(t).repartition(3),
                            "k", "x", k=3, tiebreak="id").take_all()
        con.register("t", t)
        want = con.execute("""
            SELECT k, x, id FROM t QUALIFY
            row_number() OVER (PARTITION BY k ORDER BY x DESC, id) <= 3
        """).arrow().to_pylist()
        assert _sorted_rows(got, ["k", "x", "id"]) == \
            _sorted_rows(want, ["k", "x", "id"]), seed


def test_random_pivot_vs_duckdb(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.relational import pivot_aggregate

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 120))
        t = pa.table({
            "k": pa.array(rng.integers(0, 4, n), type=pa.int64()),
            "p": pa.array([f"c{int(x)}" for x in rng.integers(0, 3, n)],
                          type=pa.string()),
            "v": pa.array(rng.integers(0, 50, n), type=pa.int64()),
        })
        got = pivot_aggregate(ray.data.from_arrow(t).repartition(3),
                              "k", "p", ["c0", "c1", "c2"], "v").take_all()
        con.register("t", t)
        want = con.execute("""
            SELECT k,
                   sum(v) FILTER (p = 'c0') AS c0,
                   sum(v) FILTER (p = 'c1') AS c1,
                   sum(v) FILTER (p = 'c2') AS c2
            FROM t GROUP BY k""").arrow().to_pylist()
        g = {r["k"]: (r.get("v_c0"), r.get("v_c1"), r.get("v_c2"))
             for r in got}
        w = {r["k"]: tuple(None if r[c] is None else int(r[c])
                           for c in ("c0", "c1", "c2")) for r in want}
        assert g == w, seed


def test_random_set_ops_all_vs_duckdb(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.relational import set_op

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        lt = _rand_table(rng, int(rng.integers(1, 80)), 5)
        rt = _rand_table(rng, int(rng.integers(1, 80)), 5)
        # tiny value domain -> real multiplicities on both sides
        lt = lt.set_column(1, "v", pa.array(
            np.asarray(lt.column("v")) % 3, type=pa.int64()))
        rt = rt.set_column(1, "v", pa.array(
            np.asarray(rt.column("v")) % 3, type=pa.int64()))
        con.register("l", lt)
        con.register("r", rt)
        for op, sql in (("except_all", "EXCEPT ALL"),
                        ("intersect_all", "INTERSECT ALL")):
            got = set_op(ray.data.from_arrow(lt).repartition(3),
                         ray.data.from_arrow(rt).repartition(3),
                         op).take_all()
            want = con.execute(
                f"SELECT * FROM l {sql} SELECT * FROM r").arrow().to_pylist()
            assert _sorted_rows(got, ["k", "v"]) == \
                _sorted_rows(want, ["k", "v"]), (op, seed)


def test_random_new_windows_vs_duckdb(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.relational import window_functions

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 120))
        x = rng.integers(0, 4, n).astype(object)
        x[rng.random(n) < 0.2] = None  # nulls rank last / skip in sums
        t = pa.table({
            "g": pa.array(rng.integers(0, 5, n), type=pa.int64()),
            "o": pa.array(np.arange(n), type=pa.int64()),
            "x": pa.array(list(x), type=pa.int64()),
        })
        got = window_functions(
            ray.data.from_arrow(t).repartition(3), "g", "o",
            {"pr": ("percent_rank", "x"), "cd": ("cume_dist", "x"),
             "ms": ("moving_sum", "x", 3)}).take_all()
        want = con.execute("""
            SELECT g, o, x,
                   percent_rank() OVER (PARTITION BY g ORDER BY x) AS pr,
                   cume_dist() OVER (PARTITION BY g ORDER BY x) AS cd,
                   sum(x) OVER (PARTITION BY g ORDER BY o
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                     AS ms
            FROM t
        """).arrow().to_pylist()
        cols = ["g", "o", "x", "pr", "cd", "ms"]
        assert _sorted_rows(got, cols) == _sorted_rows(want, cols), seed


def test_random_grouped_mode_vs_duckdb(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.relational import grouped_mode

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        t = _rand_table(rng, int(rng.integers(1, 150)), 5)
        # tiny value domain -> ties are common; nulls must be ignored
        v = (np.asarray(t.column("v")) % 3).astype(object)
        v[rng.random(len(v)) < 0.2] = None
        t = t.set_column(1, "v", pa.array(list(v), type=pa.int64()))
        con.register("t", t)
        got = grouped_mode(ray.data.from_arrow(t).repartition(3),
                           "k", "v").take_all()
        want = con.execute("""
            SELECT k, v, n FROM (
                SELECT k, v, count(*) AS n,
                       row_number() OVER (PARTITION BY k
                                          ORDER BY count(*) DESC, v ASC) rn
                FROM t WHERE v IS NOT NULL GROUP BY k, v) WHERE rn = 1
        """).arrow().to_pylist()
        assert _sorted_rows(got, ["k", "v", "n"]) == \
            _sorted_rows(want, ["k", "v", "n"]), seed


def test_random_unpivot_matches_manual(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.relational import unpivot

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 60))
        a = rng.integers(-5, 5, n).astype(object)
        a[rng.random(n) < 0.2] = None
        t = pa.table({
            "id": pa.array(np.arange(n), type=pa.int64()),
            "a": pa.array(list(a), type=pa.int64()),
            "b": pa.array(rng.random(n)),
        })
        got = unpivot(ray.data.from_arrow(t).repartition(3),
                      ["id"], ["a", "b"]).take_all()
        want = []
        for i in range(n):
            av = t.column("a")[i].as_py()
            want.append({"id": i, "name": "a",
                         "value": None if av is None else float(av)})
            want.append({"id": i, "name": "b",
                         "value": t.column("b")[i].as_py()})
        cols = ["id", "name", "value"]
        assert _sorted_rows(got, cols) == _sorted_rows(want, cols), seed


def test_random_funnel_vs_duckdb(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.relational import funnel

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(50, 400))
        u = rng.integers(0, 30, n).astype(object)
        u[rng.random(n) < 0.1] = None  # null users drop at the first join
        ts = rng.integers(0, 5000, n).astype(object)
        ts[rng.random(n) < 0.1] = None  # null timestamps never match
        t = pa.table({
            "u": pa.array(list(u), type=pa.int64()),
            "ts": pa.array(list(ts), type=pa.int64()),
            "ev": pa.array(rng.choice(["a", "b", "c", "x"], n)),
        })
        got = funnel(ray.data.from_arrow(t).repartition(3),
                     "u", "ts", "ev", ["a", "b", "c"])
        con.register("t", t)
        want = con.execute("""
            WITH s1 AS (SELECT u, min(ts) AS t1 FROM t
                        WHERE ev='a' AND ts IS NOT NULL GROUP BY u),
            s2 AS (SELECT t.u, min(ts) AS t2 FROM t JOIN s1 USING(u)
                   WHERE ev='b' AND ts > s1.t1 GROUP BY t.u),
            s3 AS (SELECT t.u, min(ts) AS t3 FROM t JOIN s2 USING(u)
                   WHERE ev='c' AND ts > s2.t2 GROUP BY t.u)
            SELECT (SELECT count(*) FROM s1), (SELECT count(*) FROM s2),
                   (SELECT count(*) FROM s3)""").fetchall()
        assert [r["n_users"] for r in got.to_pylist()] == list(want[0]), seed


def test_random_funnel_within_vs_duckdb(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.relational import funnel

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(50, 400))
        t = pa.table({
            "u": pa.array(rng.integers(0, 30, n), type=pa.int64()),
            "ts": pa.array(rng.integers(0, 5000, n), type=pa.int64()),
            "ev": pa.array(rng.choice(["a", "b", "c", "x"], n)),
        })
        got = funnel(ray.data.from_arrow(t).repartition(3),
                     "u", "ts", "ev", ["a", "b", "c"], within=800)
        con.register("t", t)
        # window anchored at the user's EARLIEST step-1 event
        want = con.execute("""
            WITH s1 AS (SELECT u, min(ts) AS t1 FROM t
                        WHERE ev='a' GROUP BY u),
            s2 AS (SELECT t.u, min(s1.t1) AS t1, min(ts) AS t2
                   FROM t JOIN s1 USING(u)
                   WHERE ev='b' AND ts > s1.t1 AND ts <= s1.t1 + 800
                   GROUP BY t.u),
            s3 AS (SELECT t.u, min(ts) AS t3 FROM t JOIN s2 USING(u)
                   WHERE ev='c' AND ts > s2.t2 AND ts <= s2.t1 + 800
                   GROUP BY t.u)
            SELECT (SELECT count(*) FROM s1), (SELECT count(*) FROM s2),
                   (SELECT count(*) FROM s3)""").fetchall()
        assert [r["n_users"] for r in got.to_pylist()] == list(want[0]), seed


def test_random_resample_vs_duckdb(ray_session):
    """Random sparse integer-valued event series at random bucket widths:
    the gap-free grid (fill=null) must match the unnest(generate_series)
    + LEFT JOIN twin exactly (int sums, no float rounding involved)."""
    import ray.data

    from plugin_serdes_ray.pipelines.relational import resample_timeseries

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng(100 + seed)
        n = int(rng.integers(5, 60))
        keys = rng.integers(0, 4, n).astype(object)
        keys[rng.random(n) < 0.1] = None
        # sparse microsecond timestamps inside a few hours, some nulls
        ts = rng.integers(0, 4 * 3600, n) * 1_000_000
        ts = ts.astype(object)
        ts[rng.random(n) < 0.1] = None
        vals = rng.integers(-50, 50, n).astype(object)
        vals[rng.random(n) < 0.2] = None
        t = pa.table({
            "k": pa.array(list(keys), type=pa.int64()),
            "ts": pa.array(list(ts), type=pa.int64()).cast(
                pa.timestamp("us")),
            "v": pa.array(list(vals), type=pa.int64())})
        width = int(rng.choice([60, 300, 900])) * 1_000_000
        got = resample_timeseries(
            ray.data.from_arrow(t).repartition(3), "k", "ts",
            every=width, sum_cols=["v"], fill="null").take_all()
        con.register("t", t)
        want = con.execute(f"""
            WITH agg AS (
                SELECT k, (epoch_us(ts) // {width}) * {width} AS b,
                       sum(v) AS sv, count(*) AS n
                FROM t WHERE k IS NOT NULL AND ts IS NOT NULL
                GROUP BY 1, 2),
            dense AS (
                SELECT k, unnest(generate_series(min(b), max(b),
                                                 {width})) AS b
                FROM agg GROUP BY k)
            SELECT d.k, make_timestamp(d.b) AS bucket_start,
                   a.sv AS sum_v, coalesce(a.n, 0) AS n
            FROM dense d LEFT JOIN agg a ON d.k = a.k AND d.b = a.b
        """).arrow().to_pylist()
        cols = ["k", "bucket_start", "sum_v", "n"]
        assert _sorted_rows(got, cols) == _sorted_rows(want, cols), seed


def test_random_robust_anomalies_vs_duckdb(ray_session):
    """Random per-key integer values: median/MAD flags must match the
    quantile_disc twin (integers in, exact doubles derived)."""
    import ray.data

    from plugin_serdes_ray.pipelines.relational import robust_anomalies

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng(200 + seed)
        t = _rand_table(rng, int(rng.integers(4, 70)), 5, with_nulls=False)
        got = robust_anomalies(
            ray.data.from_arrow(t).repartition(3), "k", "v",
            threshold=2.0).take_all()
        con.register("t", t)
        want = con.execute("""
            WITH med AS (SELECT k, quantile_disc(v, 0.5) AS med
                         FROM t GROUP BY 1),
            d AS (SELECT t.k, t.v,
                         abs(t.v::DOUBLE - m.med::DOUBLE) AS abs_dev
                  FROM t JOIN med m USING (k)),
            mad AS (SELECT k, quantile_disc(abs_dev, 0.5) AS mad
                    FROM d GROUP BY 1)
            SELECT d.k, d.v, d.abs_dev, m.mad,
                   d.abs_dev > 2.0 * m.mad AS is_anomaly
            FROM d JOIN mad m USING (k)
        """).arrow().to_pylist()
        cols = ["k", "v", "abs_dev", "mad", "is_anomaly"]
        assert _sorted_rows(got, cols) == _sorted_rows(want, cols), seed


def test_random_remove_frequent_lines_vs_duckdb(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.dedup import remove_frequent_lines

    con = duckdb.connect()
    vocab = ["aa", "bb", "cc", "dd", "", "ee"]
    for seed in (0, 1):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(5, 40))
        texts = []
        for _ in range(n):
            m = int(rng.integers(0, 8))
            texts.append("\n".join(
                vocab[int(j)] for j in rng.integers(0, len(vocab), m))
                if m else "")
        if rng.random() < 0.5:
            texts[0] = None
        t = pa.table({"doc_id": pa.array(list(range(n)), type=pa.int64()),
                      "text": pa.array(texts, type=pa.string())})
        min_df = int(rng.integers(2, 6))
        got = {r["doc_id"]: r for r in remove_frequent_lines(
            ray.data.from_arrow(t).repartition(3),
            min_df=min_df).take_all()}
        con.register("docs", t)
        want = con.execute(f"""
            WITH l AS (SELECT doc_id, string_split(coalesce(text, ''),
                                                   chr(10)) AS lines
                       FROM docs),
            e AS (SELECT doc_id, i, lines[i] AS line
                  FROM l, unnest(generate_series(1, len(lines))) AS u(i)),
            freq AS (SELECT line FROM (
                       SELECT DISTINCT doc_id, line FROM e
                       WHERE line <> '')
                     GROUP BY line HAVING count(*) >= {min_df}),
            kept AS (SELECT doc_id, i, line FROM e
                     WHERE line NOT IN (SELECT line FROM freq)),
            agg AS (SELECT doc_id,
                           string_agg(line, chr(10) ORDER BY i) AS text,
                           count(*)::BIGINT AS n_kept
                    FROM kept GROUP BY doc_id)
            SELECT l.doc_id, coalesce(agg.text, '') AS text,
                   len(l.lines)::BIGINT AS n_lines,
                   (len(l.lines) - coalesce(agg.n_kept, 0))::BIGINT
                       AS n_removed
            FROM l LEFT JOIN agg ON l.doc_id = agg.doc_id
        """).arrow().to_pylist()
        for w in want:
            g = got[w["doc_id"]]
            assert (g["text"], g["n_lines"], g["n_removed"]) == \
                (w["text"], w["n_lines"], w["n_removed"]), (seed, w)


def test_random_cdc_merge_vs_duckdb(ray_session):
    """Both merge paths vs a SQL rebuild (anti join + upsert winners) on
    random snapshots with duplicate keys and random deltas with LWW
    versions (unique (k, ver) per key keeps the winner well-defined)."""
    import ray.data

    from plugin_serdes_ray.pipelines.merge import (broadcast_merge,
                                                   merge_changes)

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng([21, seed])
        n = int(rng.integers(20, 120))
        snap = pa.table({
            "k": pa.array(rng.integers(0, 40, n), type=pa.int64()),
            "v": pa.array(rng.integers(-99, 99, n), type=pa.int64())})
        # delta: up to 3 versioned rows per key, ops random per row
        dkeys, dvers = [], []
        for k in rng.choice(60, size=int(rng.integers(1, 25)),
                            replace=False):
            for ver in range(1, int(rng.integers(2, 4))):
                dkeys.append(int(k))
                dvers.append(ver)
        m = len(dkeys)
        delta = pa.table({
            "k": pa.array(dkeys, type=pa.int64()),
            "v": pa.array(rng.integers(1000, 2000, m), type=pa.int64()),
            "op": pa.array(list(np.where(rng.random(m) < 0.35, "delete",
                                         "upsert").astype(object)),
                           type=pa.string()),
            "ver": pa.array(dvers, type=pa.int64())})
        con.register("snap", snap)
        con.register("delta", delta)
        want = con.execute("""
            WITH win AS (SELECT k, v, op FROM delta
                         QUALIFY row_number() OVER (
                             PARTITION BY k ORDER BY ver DESC) = 1)
            SELECT s.k, s.v FROM snap s ANTI JOIN win USING (k)
            UNION ALL
            SELECT k, v FROM win WHERE op = 'upsert'
        """).arrow().to_pylist()
        for out in (
            broadcast_merge(ray.data.from_arrow(snap), delta, "k",
                            op_column="op", version_column="ver"),
            merge_changes(ray.data.from_arrow(snap).repartition(3),
                          ray.data.from_arrow(delta).repartition(2), "k",
                          op_column="op", version_column="ver"),
        ):
            got = out.take_all()
            assert _sorted_rows(got, ["k", "v"]) == \
                _sorted_rows(want, ["k", "v"]), seed


def test_random_phrase_search_vs_duckdb(ray_session, tmp_path):
    """Positional phrase search vs the space-joined-token substring twin
    on random small-vocab corpora (tiny vocab -> dense adjacency and
    repeated-token phrases occur naturally)."""
    import ray.data

    from plugin_serdes_ray.pipelines.textindex import (build_text_index,
                                                       phrase_search_index)

    vocab = ["ga", "bu", "zo", "meu"]
    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng([31, seed])
        n = 60
        texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 12)))
                 for _ in range(n)]
        t = pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                      "text": pa.array(texts)})
        idx = str(tmp_path / f"pix{seed}")
        build_text_index(ray.data.from_arrow(t), idx, num_shards=8,
                         positions=True)
        con.register("docs", t)
        for plen in (2, 3):
            phrase = " ".join(rng.choice(vocab, size=plen))
            got = sorted(r["doc_id"] for r in
                         phrase_search_index(idx, phrase).take_all())
            want = [r[0] for r in con.execute(
                "SELECT doc_id FROM docs WHERE contains("
                "' ' || text || ' ', ' ' || ? || ' ') ORDER BY doc_id",
                [phrase]).fetchall()]
            assert got == want, (seed, phrase)


def test_random_decode_predicates_vs_duckdb(ray_session, tmp_path):
    """Container decode with random predicate conjunctions (==, ranges,
    'in') == DuckDB on the same parquet, across random multi-file
    layouts — exercises zone + bloom pruning with values both present
    and absent."""
    import pyarrow.parquet as pq_

    from plugin_serdes_ray.encode import decode_dataset, encode_files

    con = duckdb.connect()
    for seed in (0, 1):
        rng = np.random.default_rng([37, seed])
        paths = []
        for i in range(3):
            nrows = int(rng.integers(30, 120))
            t = pa.table({
                "k": pa.array(rng.integers(0, 500, nrows),
                              type=pa.int64()),
                "tag": pa.array([f"t{v}" for v in
                                 rng.integers(0, 6, nrows)]),
                "x": pa.array(rng.normal(size=nrows))})
            p = str(tmp_path / f"s{seed}f{i}.parquet")
            pq_.write_table(t, p)
            paths.append(p)
        out = str(tmp_path / f"enc{seed}")
        encode_files(paths, out, concurrency=2)
        con.execute(f"CREATE OR REPLACE VIEW all_t AS "
                    f"SELECT * FROM read_parquet({paths!r})")
        probes = [
            [("k", "==", int(rng.integers(0, 600)))],
            [("tag", "==", "t3"), ("k", ">=", 100)],
            [("k", "in", [int(v) for v in rng.integers(0, 600, 5)])],
            [("tag", "in", ["t0", "t5", "zz"]), ("k", "<", 250)],
        ]
        for preds in probes:
            got = decode_dataset(out, columns=["k", "tag"],
                                 predicate=preds).take_all()
            conds = []
            for c, op, v in preds:
                if op == "in":
                    vals = ", ".join(repr(x) for x in v)
                    conds.append(f"{c} IN ({vals})")
                else:
                    opsql = "=" if op == "==" else op
                    conds.append(f"{c} {opsql} {v!r}")
            want = con.execute(
                "SELECT k, tag FROM all_t WHERE " +
                " AND ".join(conds)).arrow().to_pylist()
            assert _sorted_rows(got, ["k", "tag"]) == \
                _sorted_rows(want, ["k", "tag"]), (seed, preds)


def test_random_grouped_linreg_vs_duckdb(ray_session):
    """regr_slope/intercept/r2/count parity on random nulls, constant
    groups, and single-row groups across several seeds."""
    import ray.data

    from plugin_serdes_ray.pipelines.relational import grouped_linreg

    con = duckdb.connect()
    for seed in (0, 1, 2, 3):
        rng = np.random.default_rng(100 + seed)
        n = int(rng.integers(5, 120))
        keys = rng.integers(0, 6, n).astype(object)
        x = rng.normal(size=n).astype(object)
        y = (2.5 * np.array(x, dtype=np.float64)
             + rng.normal(size=n)).astype(object)
        for arr in (x, y):
            arr[rng.random(n) < 0.2] = None
        # one constant-x group bolted on
        keys = np.concatenate([keys, [99, 99, 99]])
        x = np.concatenate([x, [7.0, 7.0, 7.0]])
        y = np.concatenate([y, [1.0, 2.0, 3.0]])
        t = pa.table({"k": pa.array(list(keys), type=pa.int64()),
                      "x": pa.array(list(x), type=pa.float64()),
                      "y": pa.array(list(y), type=pa.float64())})
        ds = ray.data.from_arrow(t).repartition(int(rng.integers(1, 6)))
        got = {r["k"]: r for r in
               grouped_linreg(ds, "k", "x", "y").take_all()}
        con.register("t", t)
        want = con.sql("""
            SELECT k, regr_count(y, x)::BIGINT, regr_slope(y, x),
                   regr_intercept(y, x), regr_r2(y, x)
            FROM t GROUP BY k""").fetchall()
        assert len(got) == len(want), seed
        for kk, cn, sl, ic, r2 in want:
            g = got[kk]
            assert g["n"] == cn, (seed, kk)
            for nm, w in (("slope", sl), ("intercept", ic), ("r2", r2)):
                if w is None:
                    assert g[nm] is None, (seed, kk, nm)
                else:
                    assert g[nm] == pytest.approx(w, rel=1e-9,
                                                  abs=1e-12), (seed, kk)


def test_random_evolved_decode_vs_duckdb(ray_session, tmp_path):
    """Schema-evolution decode (random rename/upcast/default/drop subset,
    optional predicate) == DuckDB SELECT with the same projection over the
    same parquet, across random multi-file layouts — including dirs whose
    parts were compacted first."""
    import pyarrow.parquet as pq_

    from plugin_serdes_ray.encode import (compact_parts, decode_dataset,
                                          encode_files)

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng([53, seed])
        paths = []
        for i in range(3):
            nrows = int(rng.integers(20, 100))
            t = pa.table({
                "a": pa.array(rng.integers(0, 100, nrows).astype(np.int32),
                              type=pa.int32()),
                "b": pa.array(rng.normal(size=nrows)),
                "tag": pa.array([f"t{v}" for v in
                                 rng.integers(0, 4, nrows)])})
            p = str(tmp_path / f"ev{seed}f{i}.parquet")
            pq_.write_table(t, p)
            paths.append(p)
        src = str(tmp_path / f"ev_enc{seed}")
        encode_files(paths, src, concurrency=2)
        if seed % 2:  # alternate: evolve a compacted dir
            dst = str(tmp_path / f"ev_cmp{seed}")
            compact_parts(src, dst, target_part_bytes=1 << 40)
            src = dst
        con.execute(f"CREATE OR REPLACE VIEW ev_t AS "
                    f"SELECT * FROM read_parquet({paths!r})")
        tgt = pa.schema([
            ("a_big", pa.int64()),        # rename + upcast int32 -> int64
            ("tag", pa.string()),
            ("extra", pa.int64()),        # new, default 9
        ])                                # b dropped
        for pred, cond in [
                (None, "TRUE"),
                (("a", ">=", 50), "a >= 50"),
                (("tag", "==", "t2"), "tag = 't2'")]:
            got = decode_dataset(src, target_schema=tgt,
                                 renames={"a": "a_big"},
                                 defaults={"extra": 9},
                                 predicate=pred).take_all()
            want = con.execute(
                "SELECT CAST(a AS BIGINT) AS a_big, tag, "
                "CAST(9 AS BIGINT) AS extra FROM ev_t WHERE "
                + cond).arrow().to_pylist()
            assert _sorted_rows(got, ["a_big", "tag", "extra"]) == \
                _sorted_rows(want, ["a_big", "tag", "extra"]), (seed, pred)


def test_random_dnf_or_predicates_vs_duckdb(ray_session, tmp_path):
    """OR-of-ANDs predicates (r5 DNF form) == DuckDB WHERE with the same
    boolean structure, over random multi-file containers with nulls; the
    partition pruner must keep any part where ANY disjunct may match."""
    import pyarrow.parquet as pq_

    from plugin_serdes_ray.encode import count_rows, decode_dataset, encode_files

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng([71, seed])
        paths = []
        for i in range(4):
            nrows = int(rng.integers(30, 120))
            k = rng.integers(i * 100, i * 100 + 60, nrows).astype(object)
            k[rng.random(nrows) < 0.15] = None
            tag = np.array([f"t{v}" for v in rng.integers(0, 5, nrows)],
                           dtype=object)
            tag[rng.random(nrows) < 0.15] = None
            t = pa.table({"k": pa.array(list(k), type=pa.int64()),
                          "tag": pa.array(list(tag), type=pa.string())})
            p = str(tmp_path / f"or{seed}f{i}.parquet")
            pq_.write_table(t, p)
            paths.append(p)
        out = str(tmp_path / f"or_enc{seed}")
        encode_files(paths, out, concurrency=2)
        con.execute(f"CREATE OR REPLACE VIEW or_t AS "
                    f"SELECT * FROM read_parquet({paths!r})")
        probes = [
            # zone-disjoint point lookups: each disjunct prunes to a
            # different part
            ([[("k", "==", 10)], [("k", "==", 310)]],
             "k = 10 OR k = 310"),
            # OR of ANDs with mixed null ops
            ([[("tag", "==", "t1"), ("k", ">=", 100)],
              [("k", "is_null", None)]],
             "(tag = 't1' AND k >= 100) OR k IS NULL"),
            ([[("tag", "is_null", None), ("k", "<", 50)],
              [("tag", "==", "t3")], [("k", ">", 330)]],
             "(tag IS NULL AND k < 50) OR tag = 't3' OR k > 330"),
            ([[("k", "in", [5, 105, 205])], [("tag", "!=", "t2")]],
             "k IN (5, 105, 205) OR tag <> 't2'"),
        ]
        for preds, cond in probes:
            got = decode_dataset(out, predicate=preds).take_all()
            want = con.execute(
                "SELECT k, tag FROM or_t WHERE " + cond).arrow().to_pylist()
            assert _sorted_rows(got, ["k", "tag"]) == \
                _sorted_rows(want, ["k", "tag"]), (seed, preds)
            assert count_rows(out, predicate=preds) == len(want), \
                (seed, preds)


def test_random_generated_dnf_structures_vs_duckdb(ray_session, tmp_path):
    """Fully random DNF shapes (1-3 disjuncts x 1-3 conjuncts, random
    ops/columns/values) translated to SQL and compared — structure
    generator insurance beyond the hand-picked probes."""
    import pyarrow.parquet as pq_

    from plugin_serdes_ray.encode import decode_dataset, encode_files

    con = duckdb.connect()
    rng = np.random.default_rng(83)
    paths = []
    for i in range(3):
        nrows = 150
        k = rng.integers(0, 300, nrows).astype(object)
        k[rng.random(nrows) < 0.1] = None
        tag = np.array([f"t{v}" for v in rng.integers(0, 6, nrows)],
                       dtype=object)
        tag[rng.random(nrows) < 0.1] = None
        t = pa.table({"k": pa.array(list(k), type=pa.int64()),
                      "tag": pa.array(list(tag), type=pa.string())})
        p = str(tmp_path / f"gd{i}.parquet")
        pq_.write_table(t, p)
        paths.append(p)
    out = str(tmp_path / "gd_enc")
    encode_files(paths, out, concurrency=2)
    con.execute(f"CREATE OR REPLACE VIEW gd_t AS "
                f"SELECT * FROM read_parquet({paths!r})")

    def rand_conjunct():
        col = rng.choice(["k", "tag"])
        op = rng.choice(["==", "!=", ">", ">=", "<", "<=",
                         "is_null", "not_null", "in"])
        if op in ("is_null", "not_null"):
            return (col, op, None), \
                f"{col} IS {'NOT ' if op == 'not_null' else ''}NULL"
        if col == "k":
            if op == "in":
                vs = sorted(int(v) for v in rng.integers(0, 300, 3))
                return (col, "in", vs), f"k IN ({','.join(map(str, vs))})"
            v = int(rng.integers(0, 300))
            sql_op = "<>" if op == "!=" else op
            return (col, op, v), f"k {sql_op.replace('==', '=')} {v}"
        v = f"t{int(rng.integers(0, 6))}"
        if op == "in":
            return (col, "in", [v, "t0"]), f"tag IN ('{v}', 't0')"
        if op in (">", ">=", "<", "<="):
            return (col, op, v), f"tag {op} '{v}'"
        sql_op = "<>" if op == "!=" else "="
        return (col, op, v), f"tag {sql_op} '{v}'"

    for _ in range(25):
        disjuncts, sql_parts = [], []
        for _ in range(int(rng.integers(1, 4))):
            cs, ss = zip(*[rand_conjunct()
                           for _ in range(int(rng.integers(1, 4)))])
            disjuncts.append(list(cs))
            sql_parts.append("(" + " AND ".join(ss) + ")")
        cond = " OR ".join(sql_parts)
        got = decode_dataset(out, predicate=disjuncts).take_all()
        want = con.execute(
            "SELECT k, tag FROM gd_t WHERE " + cond).arrow().to_pylist()
        assert _sorted_rows(got, ["k", "tag"]) == \
            _sorted_rows(want, ["k", "tag"]), (cond,)


def test_dnf_or_pruning_keeps_any_matching_disjunct(ray_session, tmp_path):
    """Proof the pruner ORs across disjuncts: corrupt every part both
    point lookups exclude — decode succeeds only if exactly the two
    Bloom-selected parts open."""
    import pyarrow.parquet as pq_

    from plugin_serdes_ray.encode import (_normalize_predicates,
                                          _pruned_files, decode_dataset,
                                          encode_files)

    paths = []
    for i in range(4):
        t = pa.table({"k": pa.array(
            list(range(i * 1000, i * 1000 + 50)), type=pa.int64())})
        p = str(tmp_path / f"pr{i}.parquet")
        pq_.write_table(t, p)
        paths.append(p)
    out = str(tmp_path / "pr_enc")
    encode_files(paths, out, concurrency=2)
    preds = [[("k", "==", 10)], [("k", "==", 3010)]]
    kept = _pruned_files(out, _normalize_predicates(preds))
    assert len(kept) == 2
    import os as _os

    for f in _os.listdir(out):
        fp = _os.path.join(out, f)
        if f.endswith(".grck") and fp not in kept:
            data = bytearray(open(fp, "rb").read())
            data[len(data) // 2] ^= 0xFF        # corrupt pruned parts
            open(fp, "wb").write(bytes(data))
    rows = decode_dataset(out, predicate=preds).take_all()
    assert sorted(r["k"] for r in rows) == [10, 3010]
    # explain_pruning agrees with the pruner and names the mechanism
    from plugin_serdes_ray.encode import explain_pruning

    rep = explain_pruning(out, preds)
    assert rep.num_rows == 4
    by = {r["file"]: r for r in rep.to_pylist()}
    for f in by:
        assert by[f]["kept"] == (f in kept)
        if not by[f]["kept"]:
            assert "zone" in by[f]["reason"] or "bloom" in by[f]["reason"]
    # consistency against the pruner for every generated probe shape
    rep0 = explain_pruning(out, None)
    assert all(r["kept"] for r in rep0.to_pylist())


def test_random_is_null_on_absent_column_vs_duckdb(ray_session, tmp_path):
    """Multi-epoch corpus where epoch 1 PREDATES a column: predicates on
    the late column must match DuckDB over union_by_name (absent reads as
    NULL — is_null keeps whole old parts, comparisons/not_null prune
    them). Covers the r5 ADVICE fix across random layouts."""
    import pyarrow.parquet as pq_

    from plugin_serdes_ray.encode import decode_dataset, encode_files

    con = duckdb.connect()
    for seed in (0, 1, 2):
        rng = np.random.default_rng([67, seed])
        old_paths, new_paths = [], []
        for i in range(int(rng.integers(1, 4))):
            nrows = int(rng.integers(20, 80))
            t = pa.table({
                "id": pa.array(rng.integers(0, 10_000, nrows),
                               type=pa.int64()),
                "tag": pa.array([f"t{v}" for v in
                                 rng.integers(0, 4, nrows)])})
            p = str(tmp_path / f"ab{seed}old{i}.parquet")
            pq_.write_table(t, p)
            old_paths.append(p)
        for i in range(int(rng.integers(1, 4))):
            nrows = int(rng.integers(20, 80))
            q = rng.normal(size=nrows).astype(object)
            q[rng.random(nrows) < 0.3] = None
            t = pa.table({
                "id": pa.array(rng.integers(0, 10_000, nrows),
                               type=pa.int64()),
                "tag": pa.array([f"t{v}" for v in
                                 rng.integers(0, 4, nrows)]),
                "quality": pa.array(list(q), type=pa.float64())})
            p = str(tmp_path / f"ab{seed}new{i}.parquet")
            pq_.write_table(t, p)
            new_paths.append(p)
        d_old = str(tmp_path / f"ab_enc_old{seed}")
        d_new = str(tmp_path / f"ab_enc_new{seed}")
        encode_files(old_paths, d_old, concurrency=2)
        encode_files(new_paths, d_new, concurrency=2)
        con.execute(
            f"CREATE OR REPLACE VIEW ab_t AS SELECT * FROM "
            f"read_parquet({(old_paths + new_paths)!r}, "
            f"union_by_name=true)")
        tgt = pa.schema([("id", pa.int64()), ("tag", pa.string()),
                         ("quality", pa.float64())])
        probes = [
            ([("quality", "is_null", None)], "quality IS NULL"),
            ([("quality", "not_null", None)], "quality IS NOT NULL"),
            ([("quality", ">", 0.0)], "quality > 0.0"),
            ([("quality", "is_null", None), ("tag", "==", "t1")],
             "quality IS NULL AND tag = 't1'"),
            ([("quality", "is_null", None), ("id", "<", 5000)],
             "quality IS NULL AND id < 5000"),
        ]
        for preds, cond in probes:
            got = decode_dataset([d_old, d_new], target_schema=tgt,
                                 predicate=preds).take_all()
            want = con.execute(
                "SELECT id, tag, quality FROM ab_t WHERE "
                + cond).arrow().to_pylist()
            assert _sorted_rows(got, ["id", "tag", "quality"]) == \
                _sorted_rows(want, ["id", "tag", "quality"]), (seed, preds)


def test_random_null_predicates_vs_duckdb(ray_session, tmp_path):
    """!= / is_null / not_null (mixed with prunable conjuncts) over columns
    with random nulls == DuckDB on the same parquet."""
    import pyarrow.parquet as pq_

    from plugin_serdes_ray.encode import decode_dataset, encode_files

    con = duckdb.connect()
    for seed in (0, 1):
        rng = np.random.default_rng([61, seed])
        paths = []
        for i in range(3):
            nrows = int(rng.integers(30, 100))
            k = rng.integers(0, 50, nrows).astype(object)
            k[rng.random(nrows) < 0.2] = None
            tag = np.array([f"t{v}" for v in rng.integers(0, 4, nrows)],
                           dtype=object)
            tag[rng.random(nrows) < 0.2] = None
            t = pa.table({"k": pa.array(list(k), type=pa.int64()),
                          "tag": pa.array(list(tag), type=pa.string())})
            p = str(tmp_path / f"np{seed}f{i}.parquet")
            pq_.write_table(t, p)
            paths.append(p)
        out = str(tmp_path / f"np_enc{seed}")
        encode_files(paths, out, concurrency=2)
        con.execute(f"CREATE OR REPLACE VIEW np_t AS "
                    f"SELECT * FROM read_parquet({paths!r})")
        probes = [
            ([("tag", "!=", "t1")], "tag <> 't1'"),
            ([("k", "is_null", None)], "k IS NULL"),
            ([("tag", "not_null", None)], "tag IS NOT NULL"),
            ([("k", "not_null", None), ("k", ">=", 25)],
             "k IS NOT NULL AND k >= 25"),
            ([("tag", "is_null", None), ("k", "<", 10)],
             "tag IS NULL AND k < 10"),
            ([("k", "!=", 7), ("tag", "==", "t2")],
             "k <> 7 AND tag = 't2'"),
        ]
        for preds, cond in probes:
            got = decode_dataset(out, predicate=preds).take_all()
            want = con.execute(
                "SELECT k, tag FROM np_t WHERE " + cond).arrow().to_pylist()
            assert _sorted_rows(got, ["k", "tag"]) == \
                _sorted_rows(want, ["k", "tag"]), (seed, preds)
