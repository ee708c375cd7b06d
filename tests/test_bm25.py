"""BM25 ranked retrieval vs a pure-Python reference implementation."""

import math
import re
from collections import Counter

import pyarrow as pa
import ray

from plugin_serdes_ray.pipelines.textindex import bm25_search

_WS = r"[\t\n\f\r ]+"


def _ref_bm25(rows, query, k=10, k1=1.2, b=0.75, digits=9):
    docs = {did: [w for w in re.split(_WS, (t or "").lower()) if w]
            for did, t in rows}
    n = len(docs)
    avgdl = sum(len(ws) for ws in docs.values()) / n
    q = sorted({t.lower() for t in query})
    df = Counter(t for ws in docs.values() for t in set(ws) if t in q)
    out = []
    for did, ws in docs.items():
        tf = Counter(w for w in ws if w in q)
        if not tf:
            continue
        s = 0.0
        for t, f in tf.items():
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * f * (k1 + 1.0) / (
                f + k1 * (1.0 - b + b * len(ws) / avgdl))
        out.append((did, round(s, digits)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


CORPUS = [
    (0, "data pipeline data data spark"),
    (1, "the quick fox"),
    (2, "data spark spark cluster " + "pad " * 40),   # long doc penalty
    (3, "spark"),
    (4, "DATA Spark dAtA"),                            # lowercasing
    (5, None),
    (6, "nothing relevant here"),
]


def _ds(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    })).repartition(3)


def test_matches_reference(ray_session):
    for query in (["data", "spark"], ["Data"], ["fox", "cluster"],
                  ["absent-token"]):
        got = bm25_search(_ds(CORPUS), query, k=10)
        want = _ref_bm25(CORPUS, query)
        assert got.num_rows == len(want), (query, got)
        for i, (did, s) in enumerate(want):
            assert got.column("doc_id")[i].as_py() == did, query
            assert abs(got.column("score")[i].as_py() - s) < 1e-9, query


def test_topk_cut_and_tie_order(ray_session):
    # identical single-token docs tie exactly -> smallest doc_ids win
    rows = [(i, "tok") for i in range(9)]
    got = bm25_search(_ds(rows), ["tok"], k=4)
    assert got.column("doc_id").to_pylist() == [0, 1, 2, 3]
    assert len(set(got.column("score").to_pylist())) == 1


def test_real_table_smoke(ray_session):
    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"])
    got = bm25_search(ds, ["data", "spark"], k=5)
    assert got.num_rows == 5
    scores = got.column("score").to_pylist()
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def _ds_str_ids(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    })).repartition(2)


def test_string_doc_ids(ray_session):
    rows = [("d%d" % i, t) for i, t in CORPUS]
    got = bm25_search(_ds_str_ids(rows), ["data", "spark"], k=10)
    want = _ref_bm25(rows, ["data", "spark"])
    assert got.column("doc_id").type == pa.string()
    assert got.column("doc_id").to_pylist() == [d for d, _ in want]
    # empty result keeps the string id type too
    empty = bm25_search(_ds_str_ids(rows), ["absent-token"], k=3)
    assert empty.num_rows == 0 and empty.column("doc_id").type == pa.string()


def test_null_and_duplicate_ids_raise(ray_session):
    import pytest
    import ray.exceptions

    bad = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, None], type=pa.int64()),
        "text": pa.array(["a", "b"], type=pa.string())}))
    with pytest.raises(Exception, match="non-null"):
        bm25_search(bad, ["a"], k=2)
    dup = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 1], type=pa.int64()),
        "text": pa.array(["a", "b"], type=pa.string())}))
    with pytest.raises(Exception, match="duplicate"):
        bm25_search(dup, ["a"], k=2)
