"""Approximate nearest neighbor search over an embedding column.

- :func:`knn_brute`: exact cosine top-k baseline — the query matrix is
  broadcast ONCE via ``ray.put``; each batch does one numpy matmul and
  returns only its local top-k (k rows per query per batch), merged on the
  driver. No shuffle; O(batches * k * q) rows move.
- :func:`knn_ivf`: the scale path — a kmeans-lite coarse quantizer trained
  on a driver-side sample, centroids broadcast; batches assign + keep only
  vectors in the ``nprobe`` clusters nearest to each query.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..util import package_runtime_env


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _topk_merge(parts: list[pa.Table], k: int) -> pa.Table:
    """Merge per-batch partial top-k tables into the global top-k."""
    if not parts:
        return pa.table({"query_id": pa.array([], type=pa.int64()),
                         "vec_id": pa.array([], type=pa.int64()),
                         "score": pa.array([], type=pa.float64())})
    all_t = pa.concat_tables(parts)
    qs = np.asarray(all_t.column("query_id").to_pylist())
    vs = np.asarray(all_t.column("vec_id").to_pylist())
    sc = np.asarray(all_t.column("score").to_pylist())
    out_q, out_v, out_s = [], [], []
    for q in np.unique(qs):
        m = qs == q
        order = np.argsort(-sc[m])[:k]
        out_q += [int(q)] * len(order)
        out_v += list(vs[m][order].astype(int))
        out_s += list(sc[m][order].astype(float))
    return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                     "vec_id": pa.array(out_v, type=pa.int64()),
                     "score": pa.array(out_s, type=pa.float64())})


def knn_brute(ds, queries: np.ndarray, query_ids: Optional[list[int]] = None,
              k: int = 10, vector_column: str = "embedding",
              id_column: str = "vec_id") -> pa.Table:
    """Exact cosine top-k of each query against the whole dataset."""
    import ray

    q = _unit(np.asarray(queries, dtype=np.float32))
    qids = np.asarray(query_ids if query_ids is not None else range(len(q)))
    q_ref = ray.put((q, qids))

    def partial(batch: pa.Table) -> pa.Table:
        qm, qi = ray.get(q_ref)
        ids = np.asarray(batch.column(id_column).to_pylist())
        vecs = np.asarray(batch.column(vector_column).to_pylist(), dtype=np.float32)
        if len(vecs) == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        sims = _unit(vecs) @ qm.T                      # (n, q)
        kk = min(k, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (k, q)
        out_q, out_v, out_s = [], [], []
        for col in range(sims.shape[1]):
            rows = top[:, col]
            out_q += [int(qi[col])] * len(rows)
            out_v += list(ids[rows].astype(int))
            out_s += list(sims[rows, col].astype(float))
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "vec_id": pa.array(out_v, type=pa.int64()),
                         "score": pa.array(out_s, type=pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096,
                           runtime_env=package_runtime_env()).take_all()
    tables = [pa.Table.from_pylist(parts)] if parts else []
    return _topk_merge(tables, k)


def kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 8,
                seed: int = 3) -> np.ndarray:
    """Plain Lloyd's iterations on a sample (driver-side, numpy only)."""
    rng = np.random.default_rng(seed)
    x = _unit(sample.astype(np.float32))
    centers = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ centers.T, axis=1)
        for c in range(len(centers)):
            members = x[assign == c]
            if len(members):
                centers[c] = members.mean(axis=0)
        centers = _unit(centers)
    return centers


def knn_ivf(ds, queries: np.ndarray, query_ids: Optional[list[int]] = None,
            k: int = 10, n_clusters: int = 16, nprobe: int = 4,
            sample_size: int = 2048, vector_column: str = "embedding",
            id_column: str = "vec_id") -> pa.Table:
    """IVF: coarse-quantize on a sample; probe only nprobe clusters/query."""
    import ray

    sample_rows = ds.limit(sample_size).take_all()
    sample = np.asarray([r[vector_column] for r in sample_rows], dtype=np.float32)
    centers = kmeans_lite(sample, n_clusters)
    q = _unit(np.asarray(queries, dtype=np.float32))
    qids = np.asarray(query_ids if query_ids is not None else range(len(q)))
    probe = np.argsort(-(q @ centers.T), axis=1)[:, :nprobe]   # (q, nprobe)
    ref = ray.put((q, qids, centers, probe))

    def partial(batch: pa.Table) -> pa.Table:
        qm, qi, cen, prb = ray.get(ref)
        ids = np.asarray(batch.column(id_column).to_pylist())
        vecs = np.asarray(batch.column(vector_column).to_pylist(), dtype=np.float32)
        out_q, out_v, out_s = [], [], []
        if len(vecs):
            unit = _unit(vecs)
            assign = np.argmax(unit @ cen.T, axis=1)
            for col in range(len(qm)):
                mask = np.isin(assign, prb[col])
                if not mask.any():
                    continue
                sims = unit[mask] @ qm[col]
                sel_ids = ids[mask]
                kk = min(k, len(sel_ids))
                rows = np.argpartition(-sims, kk - 1)[:kk] if kk < len(sel_ids) else np.arange(len(sel_ids))
                out_q += [int(qi[col])] * len(rows)
                out_v += list(sel_ids[rows].astype(int))
                out_s += list(sims[rows].astype(float))
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "vec_id": pa.array(out_v, type=pa.int64()),
                         "score": pa.array(out_s, type=pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096,
                           runtime_env=package_runtime_env()).take_all()
    tables = [pa.Table.from_pylist(parts)] if parts else []
    return _topk_merge(tables, k)
