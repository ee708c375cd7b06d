"""Inverted keyword index: build, subset-probe, AND/OR search, resume."""

import glob
import os

import pyarrow as pa


def test_keyword_search_vs_sql(ray_session, sf_dir, tmp_path):
    import duckdb
    import ray.data

    from plugin_serdes_ray.pipelines.textindex import (build_text_index,
                                                       search_text_index)

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    idx = str(tmp_path / "tix")
    build_text_index(docs, idx)
    for mode, sqlop in [("and", "AND"), ("or", "OR")]:
        got = sorted(r["doc_id"] for r in
                     search_text_index(idx, ["the", "data"], mode).take_all())
        want = [r[0] for r in duckdb.sql(rf"""
            SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')
            WHERE list_contains(regexp_split_to_array(
                      lower(coalesce(text,'')), '\s+'), 'the')
              {sqlop} list_contains(regexp_split_to_array(
                      lower(coalesce(text,'')), '\s+'), 'data')
            ORDER BY doc_id""").fetchall()]
        assert got == want, mode


def test_index_probe_reads_subset_and_resumes(ray_session, tmp_path):
    import ray.data

    from plugin_serdes_ray.pipelines.textindex import (_shard_of,
                                                       build_text_index,
                                                       search_text_index)

    t = pa.table({"doc_id": list(range(6)),
                  "text": ["alpha beta", "beta gamma", "alpha",
                           "delta", "Alpha  beta", None]})
    idx = str(tmp_path / "tix")
    meta = build_text_index(ray.data.from_arrow(t), idx, num_shards=16)
    got = sorted(r["doc_id"] for r in
                 search_text_index(idx, ["alpha", "beta"], "and").take_all())
    assert got == [0, 4]       # case-folded, multi-space, null-safe
    got_or = sorted(r["doc_id"] for r in
                    search_text_index(idx, ["alpha", "beta"], "or").take_all())
    assert got_or == [0, 1, 2, 4]
    # unknown token -> empty AND
    assert search_text_index(idx, ["alpha", "zzz"], "and").count() == 0
    # subset-probe proof: corrupt every shard file the query tokens do NOT
    # hash to; the search can only succeed if it never opens them
    probe = {_shard_of(tok, meta["num_shards"]) for tok in ("alpha", "beta")}
    corrupted = 0
    for f in glob.glob(os.path.join(idx, "shard-*.parquet")):
        shard = int(os.path.basename(f).split("-")[1])
        if shard not in probe:
            open(f, "wb").write(b"not a parquet file")
            corrupted += 1
    assert corrupted > 0       # otherwise the proof below is vacuous
    got2 = sorted(r["doc_id"] for r in
                  search_text_index(idx, ["alpha", "beta"], "and").take_all())
    assert got2 == [0, 4]
    # resume: rebuild over the SAME corpus reuses the complete index as-is
    # (the corrupted non-probed shards prove no rebuild touched them)
    meta2 = build_text_index(ray.data.from_arrow(t), idx, num_shards=16)
    assert meta2 == meta


def test_stale_shards_cleared_when_meta_missing(ray_session, tmp_path):
    """An interrupted earlier build (shard files present, no meta.json) must
    not leak foreign postings into the new index."""
    import pyarrow.parquet as pq
    import ray.data

    from plugin_serdes_ray.pipelines.textindex import (_shard_of,
                                                       build_text_index,
                                                       search_text_index)

    idx = tmp_path / "tix"
    idx.mkdir()
    ghost_shard = _shard_of("ghost", 16)
    stale = idx / f"shard-{ghost_shard:04d}-0.parquet"
    pq.write_table(pa.table({"doc_id": pa.array([123], type=pa.int64()),
                             "token": ["ghost"]}), stale)
    t = pa.table({"doc_id": [0, 1], "text": ["alpha beta", "beta"]})
    build_text_index(ray.data.from_arrow(t), str(idx), num_shards=16)
    # the stale posting must be gone: 'ghost' matches nothing
    assert search_text_index(str(idx), ["ghost"], "or").count() == 0


def test_string_ids_and_typed_empty_result(ray_session, tmp_path):
    import pytest
    import ray.data

    from plugin_serdes_ray.pipelines.textindex import (build_text_index,
                                                       search_text_index)

    t = pa.table({"url": ["u/a", "u/b", "u/c"],
                  "text": ["alpha beta", "beta", "alpha"]})
    idx = str(tmp_path / "tix_str")
    build_text_index(ray.data.from_arrow(t), idx, column="text",
                     id_column="url", num_shards=64, sub_splits=2)
    got = sorted(r["url"] for r in
                 search_text_index(idx, ["alpha", "beta"], "and").take_all())
    assert got == ["u/a"]
    # a token hashing to an unoccupied shard returns an EMPTY result whose
    # id column carries the true (string) type, not a hardcoded int64
    empty = search_text_index(idx, ["zzzz"], "and")
    assert empty.count() == 0
    sch = empty.schema()
    assert sch.names == ["url"]
    assert sch.types[0] in (pa.string(), pa.large_string())
    # null doc ids fail loudly, never corrupt posting lists
    bad = pa.table({"url": ["u/a", None], "text": ["alpha", "beta"]})
    with pytest.raises(Exception, match="null"):
        build_text_index(ray.data.from_arrow(bad),
                         str(tmp_path / "tix_bad"), id_column="url")


def test_index_fingerprint_rebuild_on_corpus_change(ray_session, tmp_path):
    """A changed corpus must trigger a full index rebuild instead of
    silently serving stale postings (VERDICT r3 #3). File-backed datasets
    get the strong (size+mtime) fingerprint path."""
    import pyarrow.parquet as pq
    import ray.data

    from plugin_serdes_ray.pipelines.textindex import (build_text_index,
                                                       search_text_index)

    corpus = tmp_path / "docs.parquet"
    idx = str(tmp_path / "tix")
    pq.write_table(pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                             "text": ["alpha beta", "gamma"]}), corpus)
    build_text_index(ray.data.read_parquet(str(corpus)), idx, num_shards=8)
    assert sorted(r["doc_id"] for r in
                  search_text_index(idx, ["alpha"], "or").take_all()) == [1]

    # mutate the corpus in place: doc 1 no longer contains 'alpha'
    pq.write_table(pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                             "text": ["zeta eta", "alpha theta"]}), corpus)
    meta2 = build_text_index(ray.data.read_parquet(str(corpus)), idx,
                             num_shards=8)
    assert "fingerprint" in meta2
    assert sorted(r["doc_id"] for r in
                  search_text_index(idx, ["alpha"], "or").take_all()) == [2]
    assert search_text_index(idx, ["beta"], "or").count() == 0


def test_ivf_fingerprint_rebuild_and_distributed_quantizer(
        ray_session, tmp_path):
    """IVF meta: stale-corpus rebuild + the distributed (corpus-scale
    Lloyd) quantizer path records its iterations and stays exact at
    nprobe=all (VERDICT r3 #3)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from plugin_serdes_ray.pipelines.ann import (build_ivf_index, knn_brute,
                                                 knn_ivf_index)

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((120, 8)).astype(np.float32)
    corpus = tmp_path / "emb.parquet"
    flat = pa.array(vecs.reshape(-1).astype(np.float64))
    pq.write_table(pa.table({
        "vec_id": pa.array(range(120), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(flat, 8)}), corpus)
    ds = ray.data.read_parquet(str(corpus))
    idx = str(tmp_path / "ivf")
    meta = build_ivf_index(ds, idx, n_clusters=4, quantizer="distributed",
                           quantizer_iters=3)
    assert meta["quantizer"] == "distributed"
    assert meta["quantizer_iters"] >= 1      # the Lloyd loop really ran
    q = vecs[:2]
    exact = knn_brute(ds, q, k=5)
    got = knn_ivf_index(idx, q, k=5, nprobe=4)   # nprobe=all -> exact
    assert got.column("vec_id").to_pylist() == \
        exact.column("vec_id").to_pylist()

    # rewrite the corpus; a stale meta must NOT be reused
    vecs2 = rng.standard_normal((60, 8)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(1000, 1060), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs2.reshape(-1).astype(np.float64)), 8)}), corpus)
    ds2 = ray.data.read_parquet(str(corpus))
    meta2 = build_ivf_index(ds2, idx, n_clusters=4,
                            quantizer="distributed", quantizer_iters=3)
    assert meta2["fingerprint"] != meta["fingerprint"]
    got2 = knn_ivf_index(idx, vecs2[:1], k=3, nprobe=4)
    assert all(v >= 1000 for v in got2.column("vec_id").to_pylist())


def test_ivf_param_change_triggers_rebuild(ray_session, tmp_path):
    """Changing sample_size or quantizer_iters must invalidate the
    fingerprint — a stale index otherwise silently survives a rerun with
    different build parameters."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from plugin_serdes_ray.pipelines.ann import build_ivf_index

    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((60, 4)).astype(np.float64)
    corpus = tmp_path / "emb.parquet"
    pq.write_table(pa.table({
        "vec_id": pa.array(range(60), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1)), 4)}), corpus)
    ds = ray.data.read_parquet(str(corpus))
    idx = str(tmp_path / "ivf")
    meta = build_ivf_index(ds, idx, n_clusters=2, sample_size=32)
    meta2 = build_ivf_index(ds, idx, n_clusters=2, sample_size=16)
    assert meta2["fingerprint"] != meta["fingerprint"]
    meta3 = build_ivf_index(ds, idx, n_clusters=2, sample_size=16,
                            quantizer="distributed", quantizer_iters=2)
    assert meta3["fingerprint"] != meta2["fingerprint"]
    # unchanged params -> reuse (same fingerprint, no rebuild)
    meta4 = build_ivf_index(ds, idx, n_clusters=2, sample_size=16,
                            quantizer="distributed", quantizer_iters=2)
    assert meta4["fingerprint"] == meta3["fingerprint"]


def test_search_query_tokens_case_folded(ray_session, tmp_path):
    """The index stores LOWERCASED tokens; an uppercase query letter must
    fold to match, not silently return nothing."""
    import ray.data

    from plugin_serdes_ray.pipelines.textindex import (build_text_index,
                                                       search_text_index)

    t = pa.table({"doc_id": [0, 1], "text": ["The Data engine", "other"]})
    idx = str(tmp_path / "tix")
    build_text_index(ray.data.from_arrow(t), idx, num_shards=8)
    got = sorted(r["doc_id"] for r in
                 search_text_index(idx, ["The", "DATA"], "and").take_all())
    assert got == [0]


def test_index_dedups_duplicate_doc_rows(ray_session, tmp_path):
    """Review r4: duplicate doc_id rows in a dirty corpus doubled their
    postings, inflating per-doc AND counts into false positives (a doc
    with 'apple' twice matched the 2-token query 'apple cherry')."""
    import ray.data

    from plugin_serdes_ray.pipelines.textindex import (build_text_index,
                                                       search_text_index)

    rows = [
        {"doc_id": 1, "text": "apple banana"},
        {"doc_id": 1, "text": "apple banana"},     # duplicate row
        {"doc_id": 2, "text": "apple cherry"},
    ]
    idx = str(tmp_path / "idx")
    build_text_index(ray.data.from_items(rows), idx,
                     column="text", id_column="doc_id", num_shards=2)
    got = sorted(r["doc_id"] for r in search_text_index(
        idx, ["apple", "cherry"], mode="and").take_all())
    assert got == [2]          # doc 1 must NOT match via doubled 'apple'


def test_tokenize_positions_vectorized(ray_session):
    from plugin_serdes_ray.pipelines.textindex import tokenize_positions

    t = pa.table({"doc_id": [7, 8, 9],
                  "text": ["Alpha  beta alpha", None, "  gamma "]})
    out = tokenize_positions(t, "text", "doc_id")
    rows = sorted(zip(out.column("doc_id").to_pylist(),
                      out.column("pos").to_pylist(),
                      out.column("token").to_pylist()))
    # positions rank NON-EMPTY tokens only (multi-space and leading
    # whitespace produce empty splits that must not consume a slot)
    assert rows == [(7, 0, "alpha"), (7, 1, "beta"), (7, 2, "alpha"),
                    (9, 0, "gamma")]


def test_phrase_search_adjacency_and_repeats(ray_session, tmp_path):
    import pytest
    import ray.data

    from plugin_serdes_ray.pipelines.textindex import (build_text_index,
                                                       phrase_search_index,
                                                       search_text_index)

    t = pa.table({"doc_id": [0, 1, 2, 3, 4, 5],
                  "text": ["big data engine",          # adjacent
                           "big red data",             # NOT adjacent
                           "data big data big data",   # adjacent (twice)
                           "Big  DATA",                # case + multi-space
                           None,
                           "table table stakes"]})     # repeated token
    idx = str(tmp_path / "pix")
    build_text_index(ray.data.from_arrow(t), idx, num_shards=8,
                     positions=True)
    got = sorted(r["doc_id"] for r in
                 phrase_search_index(idx, "big data").take_all())
    assert got == [0, 2, 3]
    # repeated-token phrase: needs the SAME token at two consecutive
    # positions — 'table table' must not match a single 'table'
    got2 = sorted(r["doc_id"] for r in
                  phrase_search_index(idx, "table table").take_all())
    assert got2 == [5]
    # single-token phrase degenerates to keyword search
    got3 = sorted(r["doc_id"] for r in
                  phrase_search_index(idx, "red").take_all())
    assert got3 == [1]
    # absent phrase -> empty
    assert phrase_search_index(idx, "data engine big").count() == 0
    with pytest.raises(ValueError, match="empty"):
        phrase_search_index(idx, "   ")
    # a positional index still answers boolean searches correctly
    # (per-occurrence postings are collapsed before the AND count)
    got4 = sorted(r["doc_id"] for r in
                  search_text_index(idx, ["big", "data"], "and").take_all())
    assert got4 == [0, 1, 2, 3]
    # a non-positional index refuses phrase queries loudly
    idx2 = str(tmp_path / "flat")
    build_text_index(ray.data.from_arrow(t), idx2, num_shards=8)
    with pytest.raises(ValueError, match="positions"):
        phrase_search_index(idx2, "big data")


def test_phrase_search_vs_sql(ray_session, sf_dir, tmp_path):
    """Distributed phrase search == the space-joined-token substring SQL
    twin on the real documents table."""
    import duckdb
    import ray.data

    from plugin_serdes_ray.pipelines.textindex import phrase_search

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    idx = str(tmp_path / "pix_docs")
    got = sorted(r["doc_id"] for r in
                 phrase_search(docs, "big data", index_dir=idx).take_all())
    want = [r[0] for r in duckdb.sql(rf"""
        WITH s AS (SELECT doc_id,
                       ' ' || array_to_string(list_filter(
                           regexp_split_to_array(
                               lower(coalesce(text, '')), '\s+'),
                           x -> x <> ''), ' ') || ' ' AS toks
                   FROM read_parquet('{sf_dir}/documents.parquet'))
        SELECT doc_id FROM s WHERE contains(toks, ' big data ')
        ORDER BY doc_id""").fetchall()]
    assert got == want and len(want) > 0


def test_rrf_fuse_reference_and_ties():
    from plugin_serdes_ray.pipelines.textindex import rrf_fuse

    out = rrf_fuse([[1, 2, 3], [3, 4]], k=3, rrf_k=60)
    # 3: 1/63 + 1/61; 1: 1/61; 4: 1/62; 2: 1/62 -> tie with 4, id asc
    want = {3: 1 / 63 + 1 / 61, 1: 1 / 61, 4: 1 / 62, 2: 1 / 62}
    ids = out.column("id").to_pylist()
    assert ids == [3, 1, 2]
    for i, s in zip(ids, out.column("score").to_pylist()):
        assert s == want[i]
    assert out.column("rank_0").to_pylist() == [3, 1, 2]
    assert out.column("rank_1").to_pylist() == [1, None, None]


def test_hybrid_search_fuses_both_arms(ray_session):
    """A doc that is mediocre in each arm but present in both must beat a
    doc that tops one arm only; result parity vs an explicit driver-side
    recompute of BM25 + cosine + RRF."""
    import numpy as np
    import ray.data

    from plugin_serdes_ray.pipelines.ann import knn_brute
    from plugin_serdes_ray.pipelines.textindex import (bm25_search,
                                                       hybrid_search,
                                                       rrf_fuse)
    from plugin_serdes_ray.pipelines.vectors import (TextFeaturizer,
                                                     text_features,
                                                     projection_matrix)

    texts = [
        "alpha beta gamma data",                  # 0: one bm25 hit
        "data data data data window window",      # 1: bm25 heavy
        "spark window data <<<< .... 12345",      # 2: both-ish
        "nothing relevant here at all",           # 3: neither
        "spark spark window data . . . <",        # 4: both-ish
    ] * 3
    ids = list(range(len(texts)))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array([f"{t} uniq{si}" for si, t in enumerate(texts)]),
    })).repartition(3)
    probe = "spark window data . < 42"
    qv = (text_features(pa.array([probe])) @ projection_matrix())[0]
    got = hybrid_search(ds, ["data", "spark", "window"], qv, k=5)
    # reference: same arms recomputed through the public pieces
    bm = bm25_search(ds, ["data", "spark", "window"], k=10)
    ann = knn_brute(ds.map_batches(TextFeaturizer, batch_format="pyarrow",
                                   concurrency=1),
                    np.asarray([qv]), k=10, id_column="doc_id",
                    dtype=np.float64)
    arows = sorted(((round(float(s), 9), i) for i, s in
                    zip(ann.column("vec_id").to_pylist(),
                        ann.column("score").to_pylist())),
                   key=lambda t: (-t[0], t[1]))
    want = rrf_fuse([bm.column("doc_id").to_pylist(),
                     [i for _, i in arows]], k=5)
    assert got.column("doc_id").to_pylist() == want.column("id").to_pylist()
    assert got.column("score").to_pylist() == \
        want.column("score").to_pylist()
    assert got.column("bm25_rank").null_count < got.num_rows
    assert got.column("ann_rank").null_count < got.num_rows
