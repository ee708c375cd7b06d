"""Cross-corpus paragraph (line) dedup vs a pure-Python reference."""

import pyarrow as pa
import pytest
import ray

from plugin_serdes_ray.pipelines.dedup import line_counts, paragraph_dedup


def _ref(rows, min_count=2, keep="none", sep="\n"):
    from collections import Counter
    cnt = Counter()
    for _, text in rows:
        for ln in (text or "").split(sep):
            if ln:
                cnt[ln] += 1
    dups = {ln for ln, c in cnt.items() if c >= min_count}
    firsts = {}
    for did, text in sorted(rows):
        for i, ln in enumerate((text or "").split(sep)):
            if ln in dups and ln not in firsts:
                firsts[ln] = (did, i)
    out = {}
    for did, text in rows:
        kept = []
        for i, ln in enumerate((text or "").split(sep)):
            if ln == "" or ln not in dups or (
                    keep == "first" and firsts[ln] == (did, i)):
                kept.append(ln)
        out[did] = sep.join(kept)
    return out


CORPUS = [
    (0, "unique alpha\nCOMMON FOOTER\nunique beta"),
    (1, "COMMON FOOTER\nunique gamma\n\nCOMMON FOOTER"),
    (2, "unique delta\nSHARED AD\nunique epsilon\nSHARED AD"),
    (3, "SHARED AD\nCOMMON FOOTER"),              # fully boilerplate
    (4, None),                                     # null text
    (5, ""),                                       # empty text
    (6, "\n\nunique zeta\n"),                      # structural empties
]


def _ds(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    })).repartition(3)


def _run(keep, **kw):
    out = paragraph_dedup(_ds(CORPUS), keep=keep, **kw).take_all()
    return {r["doc_id"]: r["text"] for r in out}


def test_line_counts(ray_session):
    got = {r["line"]: r["cnt"] for r in line_counts(_ds(CORPUS)).take_all()}
    assert got["COMMON FOOTER"] == 4
    assert got["SHARED AD"] == 3
    assert got["unique alpha"] == 1
    assert "" not in got


@pytest.mark.parametrize("keep", ["none", "first"])
@pytest.mark.parametrize("limit", [2_000_000, 0])   # broadcast vs join path
def test_matches_reference(ray_session, keep, limit):
    got = _run(keep, broadcast_limit=limit)
    want = _ref(CORPUS, keep=keep)
    assert got == want
    # structural guarantees
    assert got[3] == ("" if keep == "none" else _ref(CORPUS, keep=keep)[3])
    assert got[4] == "" and got[5] == ""
    assert got[6] == "\n\nunique zeta\n"   # untouched incl. empties


def test_keep_first_keeps_exactly_one(ray_session):
    for limit in (2_000_000, 0):
        got = _run("first", broadcast_limit=limit)
        joined = "\n".join(got.values())
        assert joined.count("COMMON FOOTER") == 1
        assert joined.count("SHARED AD") == 1
        # the survivor is the smallest (doc_id, idx): doc 0 line 1 / doc 2
        assert "COMMON FOOTER" in got[0]
        assert "SHARED AD" in got[2]


def test_min_count_threshold(ray_session):
    got = _run("none", min_count=4)   # only COMMON FOOTER (4 occurrences)
    assert "COMMON FOOTER" not in "\n".join(got.values())
    assert "\n".join(got.values()).count("SHARED AD") == 3


def test_no_dups_passthrough(ray_session):
    rows = [(0, "a\nb"), (1, "c\nd"), (2, None)]
    out = {r["doc_id"]: r["text"]
           for r in paragraph_dedup(_ds(rows)).take_all()}
    assert out == {0: "a\nb", 1: "c\nd", 2: ""}


def test_real_table_smoke(ray_session):
    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"])
    out = paragraph_dedup(ds, keep="first").take_all()
    assert len(out) == ds.count()
    assert all(r["text"] is not None for r in out)


def test_remove_frequent_lines_semantics(ray_session):
    """ALL occurrences of a frequent line vanish (vs paragraph_dedup's
    keep-first); empty lines are structural and survive; NULL text
    rebuilds to ''."""
    import ray.data

    from plugin_serdes_ray.pipelines.dedup import remove_frequent_lines

    rows = [
        {"doc_id": 1, "text": "BANNER\nreal one\n\nfooter"},
        {"doc_id": 2, "text": "BANNER\nreal two\nfooter"},
        {"doc_id": 3, "text": "BANNER\nunique\nfooter"},
        {"doc_id": 4, "text": None},
    ]
    ds = ray.data.from_items(rows).repartition(2)
    got = sorted(remove_frequent_lines(ds, min_df=3).take_all(),
                 key=lambda r: r["doc_id"])
    assert [r["text"] for r in got] == [
        "real one\n", "real two", "unique", ""]
    assert [r["n_lines"] for r in got] == [4, 3, 3, 1]
    assert [r["n_removed"] for r in got] == [2, 2, 2, 0]
    # min_df above the corpus df: nothing removed, text round-trips
    same = sorted(remove_frequent_lines(ds, min_df=4).take_all(),
                  key=lambda r: r["doc_id"])
    assert [r["n_removed"] for r in same] == [0, 0, 0, 0]
    assert same[0]["text"] == rows[0]["text"]


def test_remove_frequent_lines_broadcast_limit(ray_session):
    import pytest
    import ray.data

    from plugin_serdes_ray.pipelines.dedup import remove_frequent_lines

    ds = ray.data.from_items(
        [{"doc_id": i, "text": "shared\nl%d" % i} for i in range(4)])
    with pytest.raises(ValueError, match="broadcast_limit"):
        remove_frequent_lines(ds, min_df=1, broadcast_limit=2).take_all()
