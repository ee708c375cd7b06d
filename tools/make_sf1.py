"""Synthesize a deterministic sf1 dir (10x sf0.1) under /tmp for the
round-5 scale-step evidence (VERDICT r4 #7). No external data: documents
are 10 deterministic replicas of the driver's sf0.1 table with per-replica
token permutations (seeded by (replica, doc_id)), so replicas are NOT
near-duplicates of each other — wall-clock linearity measures scale, not
an artificially densified duplicate graph. lineitem is written as a
row-count-only stub (null column) because the webpages corpus sizing in
``fixtures.webpages_for_sf`` reads just its num_rows metadata.

Usage: python tools/make_sf1.py [--src /root/testdata/sf0.1]
                                [--out /tmp/graft_sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = 10
ID_STRIDE = 10_000_000


def perturbed_text(text: str, rep: int, doc_id: int) -> str:
    if rep == 0:
        return text
    import numpy as np

    toks = text.split(" ")
    rng = np.random.default_rng((rep << 32) ^ (doc_id & 0xFFFFFFFF))
    order = rng.permutation(len(toks))
    return " ".join(toks[i] for i in order)


def main() -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/graft_sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    marker = os.path.join(args.out, "_GENERATED.json")
    want = {"src": args.src, "replicas": REPLICAS, "v": 1}
    if os.path.exists(marker) and json.load(open(marker)) == want:
        print(json.dumps({"out": args.out, "cached": True}))
        return 0

    docs = pq.read_table(os.path.join(args.src, "documents.parquet"))
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    parts = []
    for rep in range(REPLICAS):
        new_texts = [None if t is None else perturbed_text(t, rep, i)
                     for i, t in zip(ids, texts)]
        t = docs.set_column(
            docs.schema.get_field_index("doc_id"), "doc_id",
            pa.array([i + rep * ID_STRIDE for i in ids], type=pa.int64()))
        t = t.set_column(t.schema.get_field_index("text"), "text",
                         pa.array(new_texts, type=pa.string()))
        if "n_chars" in t.column_names:
            t = t.set_column(
                t.schema.get_field_index("n_chars"), "n_chars",
                pa.array([None if x is None else len(x)
                          for x in new_texts], type=pa.int64()))
        parts.append(t)
    out_docs = pa.concat_tables(parts)
    pq.write_table(out_docs, os.path.join(args.out, "documents.parquet"))

    # row-count stub: webpages_for_sf sizes the bench corpus from
    # lineitem's num_rows only
    n_li = pq.read_metadata(
        os.path.join(args.src, "lineitem.parquet")).num_rows * REPLICAS
    stub = pa.table({"stub": pa.nulls(n_li, pa.int8())})
    pq.write_table(stub, os.path.join(args.out, "lineitem.parquet"))

    with open(marker, "w") as f:
        json.dump(want, f)
    print(json.dumps({"out": args.out, "rows": out_docs.num_rows,
                      "lineitem_rows": n_li, "cached": False}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
