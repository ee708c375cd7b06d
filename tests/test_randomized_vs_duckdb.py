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
