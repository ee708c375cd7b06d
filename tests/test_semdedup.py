"""Intra-doc paragraph dedup + SemDeDup-style semantic dedup."""
import numpy as np
import pyarrow as pa
import ray

from plugin_serdes_ray.pipelines.dedup import paragraph_dedup_doc, semdedup


def _docs(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string())}))


def _texts(out):
    return {r["doc_id"]: r["text"] for r in out.take_all()}


class TestParagraphDedupDoc:
    def test_repeats_within_doc_drop_later_occurrences(self, ray_session):
        out = _texts(paragraph_dedup_doc(_docs([
            (1, "nav\nbody one\nnav\nbody two\nnav"),
            (2, "x\ny\nz")])))
        assert out[1] == "nav\nbody one\nbody two"
        assert out[2] == "x\ny\nz"

    def test_cross_doc_repeats_survive(self, ray_session):
        # the SAME line in two different docs is NOT intra-doc duplicate
        out = _texts(paragraph_dedup_doc(_docs([
            (1, "shared\na"), (2, "shared\nb")])))
        assert out[1] == "shared\na" and out[2] == "shared\nb"

    def test_empty_lines_structural(self, ray_session):
        out = _texts(paragraph_dedup_doc(_docs([
            (1, "a\n\na\n\nb")])))
        # both empties kept, second "a" dropped
        assert out[1] == "a\n\n\nb"

    def test_null_and_empty_text(self, ray_session):
        out = _texts(paragraph_dedup_doc(_docs([(1, None), (2, "")])))
        assert out[1] == "" and out[2] == ""

    def test_matches_python_reference(self, ray_session):
        rng = np.random.RandomState(3)
        lines = ["l%d" % i for i in range(6)] + [""]
        rows = [(i, "\n".join(rng.choice(lines, rng.randint(0, 9))))
                for i in range(40)]
        out = _texts(paragraph_dedup_doc(_docs(rows)))

        def ref(text):
            seen, kept = set(), []
            for ln in text.split("\n"):
                if ln == "" or ln not in seen:
                    kept.append(ln)
                    if ln:
                        seen.add(ln)
            return "\n".join(kept)

        for i, t in rows:
            assert out[i] == ref(t), i


def _emb(ids, vecs):
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([None if v is None else list(map(float, v))
                               for v in vecs],
                              type=pa.list_(pa.float32()))}))


def _keep_map(out):
    return {r["vec_id"]: r["keep"] for r in out.take_all()}


def _ref_semdedup(ids, vecs, centroids, threshold, digits=9):
    """Brute-force NOT-EXISTS reference."""
    keep = {}
    assign = {}
    c = np.asarray(centroids, dtype=np.float64)
    for i, v in zip(ids, vecs):
        if v is None:
            assign[i] = None
            continue
        x = np.asarray(v, dtype=np.float64)
        assign[i] = int(np.argmin(((c - x) ** 2).sum(axis=1)))
    for i, v in zip(ids, vecs):
        if v is None:
            keep[i] = True
            continue
        x = np.asarray(v, dtype=np.float64)
        nx = np.linalg.norm(x)
        k = True
        for j, w in sorted(zip(ids, vecs)):
            if w is None or j >= i or assign[j] != assign[i]:
                continue
            y = np.asarray(w, dtype=np.float64)
            ny = np.linalg.norm(y)
            cos = 0.0 if nx == 0 or ny == 0 else float(x @ y / (nx * ny))
            if round(cos, digits) >= threshold:
                k = (False, j)    # smallest qualifying id wins
                break
        keep[i] = k if k is not True else True
    return keep


class TestSemDedup:
    def test_near_duplicates_drop_keep_smallest_id(self, ray_session):
        base = np.array([1.0, 0.0, 0.0, 0.0])
        near = np.array([0.999, 0.01, 0.0, 0.0])   # cos ~ 0.99995
        far = np.array([0.0, 1.0, 0.0, 0.0])
        out = _keep_map(semdedup(
            _emb([10, 11, 12], [base, near, far]),
            threshold=0.95,
            centroids=[[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]))
        assert out == {10: True, 11: False, 12: True}

    def test_different_clusters_never_compared(self, ray_session):
        # cos(a, e) ~ 0.95 >= threshold, but the centroids put them in
        # different clusters -> BOTH kept; collapsing to one cluster
        # (single centroid) drops the larger id
        ds = _emb([0, 1], [[1.0, 0.0], [0.95, 0.31]])
        two = _keep_map(semdedup(
            ds, threshold=0.9, centroids=[[1.0, 0.0], [0.94, 0.32]]))
        assert two == {0: True, 1: True}
        one = _keep_map(semdedup(
            ds, threshold=0.9, centroids=[[1.0, 0.0]]))
        assert one == {0: True, 1: False}

    def test_matches_reference_randomized(self, ray_session):
        rng = np.random.RandomState(11)
        n, d = 120, 6
        vecs = list(rng.standard_normal((n, d)))
        # inject near-dup pairs
        for a, b in [(5, 50), (9, 90), (20, 21)]:
            vecs[b] = vecs[a] * 1.01 + rng.standard_normal(d) * 1e-4
        vecs[7] = np.zeros(d)               # zero vector: always kept
        ids = list(range(n))
        vl = [None if i == 13 else v for i, v in zip(ids, vecs)]
        ds = _emb(ids, vl)
        from plugin_serdes_ray.pipelines.vectors import kmeans_init_first_k
        cents = kmeans_init_first_k(ds, 4, "embedding", "vec_id")
        rows = semdedup(ds, threshold=0.97, centroids=cents).take_all()
        out = {r["vec_id"]: (True if r["keep"]
                             else (False, r["dup_of"])) for r in rows}
        # float32 storage: the reference must see the same rounded values
        v32 = [None if v is None else np.asarray(v, np.float32)
               for v in vl]
        ref = _ref_semdedup(ids, v32, cents, 0.97)
        assert out == ref
        assert out[7] is True and out[13] is True
        assert out[50] == (False, 5) and out[90] == (False, 9) \
            and out[21] == (False, 20)
        assert all(r["dup_of"] is None for r in rows if r["keep"])

    def test_null_vector_null_cluster(self, ray_session):
        rows = semdedup(_emb([1, 2], [[1.0, 0.0], None]),
                        threshold=0.9, k=1).take_all()
        by = {r["vec_id"]: r for r in rows}
        assert by[2]["cluster"] is None and bool(by[2]["keep"])
        assert by[1]["cluster"] == 0 and bool(by[1]["keep"])

    def test_distributed_iters_path_runs(self, ray_session):
        rng = np.random.RandomState(5)
        ds = _emb(range(60), list(rng.standard_normal((60, 4))))
        out = semdedup(ds, threshold=0.99, k=3, iters=2).take_all()
        assert len(out) == 60 and all(r["keep"] in (True, False)
                                      for r in out)


class TestSemDedupEdges:
    def test_float64_embeddings_zero_copy_view(self, ray_session):
        # list<double> storage: vectors_to_numpy hands back a READ-ONLY
        # zero-copy view; the in-place normalize must copy first
        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array([1, 2, 3], type=pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0], [1.0, 1e-6], [0.0, 1.0]],
                type=pa.list_(pa.float64()))}))
        out = _keep_map(semdedup(ds, threshold=0.95,
                                 centroids=[[1.0, 0.0], [0.0, 1.0]]))
        assert out == {1: True, 2: False, 3: True}

    def test_zero_vector_never_kills_at_nonpositive_threshold(
            self, ray_session):
        # smallest-id row is the ZERO vector; at threshold 0.0 a cos-0
        # score would wrongly qualify — the contract says cos(0, x) is
        # undefined (-inf), so later orthogonal rows must survive
        ds = _emb([1, 2, 3], [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        out = semdedup(ds, threshold=0.0,
                       centroids=[[0.5, 0.5]]).take_all()
        by = {r["vec_id"]: r for r in out}
        assert bool(by[1]["keep"]) and bool(by[2]["keep"])
        # 3 is killed by 2 (cos exactly 0.0 >= 0.0) but NOT by the zero
        # vector 1 — dup_of must name 2
        assert not by[3]["keep"] and by[3]["dup_of"] == 2
