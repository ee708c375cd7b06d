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
    n_files = len(glob.glob(os.path.join(idx, "shard-*.parquet")))
    # probing one token must touch a strict subset of shards
    probe = {_shard_of("alpha", meta["num_shards"])}
    assert len(probe) < n_files
    got = sorted(r["doc_id"] for r in
                 search_text_index(idx, ["alpha", "beta"], "and").take_all())
    assert got == [0, 4]       # case-folded, multi-space, null-safe
    got_or = sorted(r["doc_id"] for r in
                    search_text_index(idx, ["alpha", "beta"], "or").take_all())
    assert got_or == [0, 1, 2, 4]
    # unknown token -> empty AND
    assert search_text_index(idx, ["alpha", "zzz"], "and").count() == 0
    # resume: rebuild over DIFFERENT data reuses the complete index as-is
    meta2 = build_text_index(
        ray.data.from_arrow(pa.table({"doc_id": [9], "text": ["x"]})), idx)
    assert meta2 == meta
