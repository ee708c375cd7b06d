"""Deduplication operators over a document table.

Scale design (100 TB framing): every variant is
``map_batches(vectorized signatures) -> ONE keyed shuffle (groupby on a
small fixed-width key) -> map_groups verify``. Signatures are computed
where the data lives; only (key, id[, signature]) pairs move through the
shuffle, never the documents themselves. The exact variant's key is a
64-bit content hash (hash-partition + per-group-first); the near-dup
variants bucket by MinHash bands / SimHash bands / hyperplane signs.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import package_runtime_env

MERSENNE = (1 << 61) - 1


def _content_hash64(arr: pa.Array) -> np.ndarray:
    """Vectorized-enough 64-bit content hash (sha1 truncated — stable across
    runs and processes, unlike Python's randomized hash())."""
    out = np.empty(len(arr), dtype=np.uint64)
    for i, v in enumerate(arr):
        b = v.as_py()
        if b is None:
            out[i] = 0
        else:
            if isinstance(b, str):
                b = b.encode()
            out[i] = np.frombuffer(hashlib.sha1(b).digest()[:8], dtype=np.uint64)[0]
    return out


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, column: str, id_column: str):
    """Keep, per distinct ``column`` value, the row with the smallest
    ``id_column``. hash-partition + per-group-first: the shuffle key is the
    64-bit content hash, not the (potentially megabytes) value itself."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = _content_hash64(batch.column(column).combine_chunks())
        return batch.append_column("__h", pa.array(h.astype(np.int64)))

    def first_per_group(group: pa.Table) -> pa.Table:
        idx = pc.index(group.column(id_column),
                       pc.min(group.column(id_column)).as_py()).as_py()
        # hash collisions: keep first row per distinct actual value
        vals = group.column(column)
        seen: dict = {}
        keep = []
        order = pc.sort_indices(group.column(id_column)).to_pylist()
        for i in order:
            v = vals[i].as_py()
            if v not in seen:
                seen[v] = True
                keep.append(i)
        return group.take(sorted(keep)).drop_columns(["__h"])

    return (
        ds.map_batches(add_hash, batch_format="pyarrow",
                       runtime_env=package_runtime_env())
        .groupby("__h")
        .map_groups(first_per_group, batch_format="pyarrow",
                    runtime_env=package_runtime_env())
    )


# ---------------------------------------------------------------------------
# character shingles + MinHash
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Rolling polynomial hash of char k-grams, vectorized over the string."""
    b = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.uint64)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    base = np.uint64(1000003)
    powers = base ** np.arange(k, dtype=np.uint64)  # wraps mod 2^64 (fine)
    n = len(b) - k + 1
    windows = np.lib.stride_tricks.sliding_window_view(b, k)
    return np.unique((windows * powers).sum(axis=1, dtype=np.uint64))


def minhash_signature(text: str, num_perm: int = 64, k: int = 5,
                      seed: int = 1) -> np.ndarray:
    """num_perm MinHash values via (a*h + b) mod p universal hashing."""
    h = _shingle_hashes(text, k)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, num_perm, dtype=np.uint64)
    bb = rng.integers(0, MERSENNE, num_perm, dtype=np.uint64)
    hm = (h % np.uint64(MERSENNE)).astype(np.uint64)
    # (num_perm, n_shingles) in python-int space is slow; use object-free mod
    vals = (np.outer(a, hm) + bb[:, None]) % np.uint64(MERSENNE)
    return vals.min(axis=1)


def jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = _shingle_hashes(a, k), _shingle_hashes(b, k)
    inter = np.intersect1d(sa, sb, assume_unique=True)
    union = len(sa) + len(sb) - len(inter)
    return len(inter) / union if union else 1.0


def minhash_lsh_duplicates(ds, column: str, id_column: str,
                           num_perm: int = 64, bands: int = 16,
                           threshold: float = 0.7, k: int = 5):
    """-> Dataset of (keep_id, dup_id) pairs: shingle -> minhash -> band ->
    bucket groupby -> in-bucket Jaccard verification.

    Only (band_key, id, signature) rows shuffle; each bucket group is tiny.
    """
    rows_per_band = num_perm // bands

    def sigs(batch: pa.Table):
        ids = batch.column(id_column).to_pylist()
        texts = batch.column(column).to_pylist()
        out_band, out_key, out_id, out_sig, out_text = [], [], [], [], []
        for i, t in zip(ids, texts):
            if t is None:
                continue
            sig = minhash_signature(t, num_perm, k)
            for b in range(bands):
                chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
                key = zlib.crc32(chunk.tobytes()) | (b << 32)
                out_band.append(b)
                out_key.append(key)
                out_id.append(i)
                out_sig.append(sig.tobytes())
                out_text.append(t)
        return pa.table({"band_key": pa.array(out_key, type=pa.int64()),
                         "doc_id": pa.array(out_id, type=pa.int64()),
                         "sig": pa.array(out_sig, type=pa.large_binary()),
                         "text": pa.array(out_text, type=pa.large_string())})

    def verify(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return pa.table({"keep_id": pa.array([], type=pa.int64()),
                             "dup_id": pa.array([], type=pa.int64())})
        ids = np.asarray(group.column("doc_id").to_pylist())
        order = np.argsort(ids)
        texts = group.column("text").to_pylist()
        keep, dup = [], []
        canon = order[0]
        for j in order[1:]:
            if ids[j] == ids[canon]:
                continue
            if jaccard(texts[canon], texts[j], k) >= threshold:
                keep.append(int(ids[canon]))
                dup.append(int(ids[j]))
        return pa.table({"keep_id": pa.array(keep, type=pa.int64()),
                         "dup_id": pa.array(dup, type=pa.int64())})

    pairs = (
        ds.map_batches(sigs, batch_format="pyarrow",
                       runtime_env=package_runtime_env())
        .groupby("band_key")
        .map_groups(verify, batch_format="pyarrow",
                         runtime_env=package_runtime_env())
    )
    return pairs


def union_find_clusters(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find over (a, b) duplicate pairs -> {id: root}.
    Roots are the smallest id of each transitive cluster, so chains
    (a~b, b~c) collapse to one keeper even when (a, c) never met in a
    bucket. Pairs are O(duplicates) — tiny relative to the corpus."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def minhash_lsh_dedup(ds, column: str, id_column: str, **kw):
    """Drop near-duplicate rows: every member of a transitive duplicate
    cluster except the smallest id. The verified pair set is collected to
    the driver (it is O(duplicates), small by assumption), union-found into
    clusters, and broadcast as a filter — ds itself streams."""
    import ray

    pairs = minhash_lsh_duplicates(ds, column, id_column, **kw)
    roots = union_find_clusters(
        [(row["keep_id"], row["dup_id"]) for row in pairs.take_all()])
    dup_ids = {x for x, r in roots.items() if x != r}
    dup_ref = ray.put(dup_ids)

    def drop(batch: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        mask = pa.array([i not in dups for i in batch.column(id_column).to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(drop, batch_format="pyarrow",
                          runtime_env=package_runtime_env())


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str, k: int = 4) -> int:
    """64-bit SimHash over char k-gram hashes (vectorized bit counting)."""
    h = _shingle_hashes(text, k)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
    score = bits.sum(axis=0) * 2 - len(h)
    return int("".join("1" if s > 0 else "0" for s in score[::-1]), 2)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_duplicates(ds, column: str, id_column: str,
                       max_hamming: int = 3, bands: int = 4):
    """Near-dup pairs by SimHash banding: if hamming(a,b) <= bands-1, at
    least one of ``bands`` disjoint 16-bit bands matches exactly -> bucket
    groupby on (band, band_bits), verify full hamming in-group."""
    width = 64 // bands

    def sigs(batch: pa.Table):
        ids = batch.column(id_column).to_pylist()
        texts = batch.column(column).to_pylist()
        key, did, sh = [], [], []
        for i, t in zip(ids, texts):
            if t is None:
                continue
            s = simhash64(t)
            for b in range(bands):
                band_bits = (s >> (b * width)) & ((1 << width) - 1)
                key.append((b << width) | band_bits)
                did.append(i)
                sh.append(s)
        return pa.table({"band_key": pa.array(key, type=pa.int64()),
                         "doc_id": pa.array(did, type=pa.int64()),
                         "simhash": pa.array([x - (1 << 63) for x in sh],
                                             type=pa.int64())})

    def verify(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_pylist()
        hs = [(x + (1 << 63)) for x in group.column("simhash").to_pylist()]
        order = np.argsort(ids)
        keep, dup = [], []
        canon = order[0]
        for j in order[1:]:
            if ids[j] != ids[canon] and hamming64(hs[canon], hs[j]) <= max_hamming:
                keep.append(ids[canon])
                dup.append(ids[j])
        return pa.table({"keep_id": pa.array(keep, type=pa.int64()),
                         "dup_id": pa.array(dup, type=pa.int64())})

    return (ds.map_batches(sigs, batch_format="pyarrow",
                           runtime_env=package_runtime_env())
            .groupby("band_key").map_groups(verify, batch_format="pyarrow",
                         runtime_env=package_runtime_env()))


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_duplicates(ds, vector_column: str, id_column: str,
                         threshold: float = 0.95, planes: int = 16,
                         seed: int = 7):
    """Near-dup pairs among embedding vectors: random-hyperplane LSH bucket
    (16-bit sign signature) -> in-bucket exact cosine verify."""

    def sigs(batch: pa.Table):
        ids = np.asarray(batch.column(id_column).to_pylist())
        vecs = np.asarray(batch.column(vector_column).to_pylist(), dtype=np.float32)
        if vecs.ndim != 2 or len(vecs) == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "vec": pa.array([], type=pa.list_(pa.float32()))})
        rng = np.random.default_rng(seed)
        planes_m = rng.standard_normal((vecs.shape[1], planes)).astype(np.float32)
        signs = (vecs @ planes_m) > 0
        buckets = (signs * (1 << np.arange(planes))).sum(axis=1).astype(np.int64)
        return pa.table({"bucket": pa.array(buckets),
                         "doc_id": pa.array(ids, type=pa.int64()),
                         "vec": pa.array(list(vecs), type=pa.list_(pa.float32()))})

    def verify(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column("doc_id").to_pylist())
        vecs = np.asarray(group.column("vec").to_pylist(), dtype=np.float32)
        keep, dup = [], []
        if len(ids) >= 2:
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1
            unit = vecs / norms
            sim = unit @ unit.T
            order = np.argsort(ids)
            taken = set()
            for oi, i in enumerate(order):
                if ids[i] in taken:
                    continue
                for j in order[oi + 1:]:
                    if ids[j] in taken:
                        continue
                    if sim[i, j] >= threshold:
                        keep.append(int(ids[i]))
                        dup.append(int(ids[j]))
                        taken.add(ids[j])
        return pa.table({"keep_id": pa.array(keep, type=pa.int64()),
                         "dup_id": pa.array(dup, type=pa.int64())})

    return (ds.map_batches(sigs, batch_format="pyarrow",
                           runtime_env=package_runtime_env())
            .groupby("bucket").map_groups(verify, batch_format="pyarrow",
                         runtime_env=package_runtime_env()))
