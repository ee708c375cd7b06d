"""Distributed BPE training/encoding vs an independent in-process
reference implementation (exact merge-sequence and token equality)."""

import os
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from plugin_serdes_ray.pipelines import bpe


# --- independent reference implementation (pure python, no sharing) ------

def _ref_merge(parts, a, b):
    out, i = [], 0
    while i < len(parts):
        if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return out


_WS = r"[\t\n\f\r ]+"   # RE2's \s — Python re's \s additionally matches
#                         \v and Unicode spaces; pin the pipeline's
#                         (split_pattern_regex / DuckDB = RE2) semantics


def _ref_words(texts):
    wc = Counter()
    for t in texts:
        for w in re.split(_WS, t or ""):
            if w and "\x1f" not in w:
                wc[w] += 1
    return wc


def _ref_train(word_counts, n_merges):
    hist = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in hist.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new = {}
        for syms, c in hist.items():
            m = tuple(_ref_merge(list(syms), *best))
            new[m] = new.get(m, 0) + c
        hist = new
    return merges, hist


def _ds(texts):
    return ray.data.from_arrow(pa.table({"text": pa.array(
        texts, type=pa.string())}))


CORPUS = ["the cat sat on the mat",
          "aaa abab aaaa",          # repeated-symbol runs: greedy L-to-R
          "the the the cat",
          None,                     # null row
          "  padded   whitespace\tmix\n",
          "unicode café naïve café"]


def test_train_matches_reference_small(ray_session):
    ref_merges, _ = _ref_train(_ref_words(CORPUS), 12)
    got = bpe.bpe_train(_ds(CORPUS), n_merges=12)
    assert got == ref_merges


def test_train_matches_reference_documents(ray_session, sf_dir):
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["text"])
    texts = t.column("text").to_pylist()
    ref_merges, _ = _ref_train(_ref_words(texts), 25)
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["text"]).repartition(4)
    got = bpe.bpe_train(ds, n_merges=25)
    assert got == ref_merges


def test_encode_replays_training(ray_session):
    """encode_word over the trained ranks must reproduce each vocab
    word's FINAL training segmentation (lowest-rank inference ==
    training-order replay)."""
    wc = _ref_words(CORPUS)
    merges, final_hist = _ref_train(wc, 12)
    ranks = {m: i for i, m in enumerate(merges)}
    final = {"".join(s): list(s) for s in final_hist}
    for w in wc:
        assert bpe.encode_word(w, ranks) == final[w], w


def test_token_counts_and_histogram(ray_session):
    wc = _ref_words(CORPUS)
    merges, final_hist = _ref_train(wc, 8)

    # expected per-row token counts
    ranks = {m: i for i, m in enumerate(merges)}
    def row_tokens(t):
        return [tok for w in re.split(_WS, t or "") if w
                for tok in bpe.encode_word(w, ranks)]
    exp_counts = [len(row_tokens(t)) for t in CORPUS]

    out = bpe.bpe_token_counts(_ds(CORPUS), merges,
                               concurrency=2).take_all()
    assert [r["n_bpe_tokens"] for r in out] == exp_counts

    # global token histogram
    exp_hist = Counter()
    for syms, c in final_hist.items():
        for s in syms:
            exp_hist[s] += c
    got = {r["token"]: r["n"]
           for r in bpe.token_histogram(_ds(CORPUS), merges,
                                        concurrency=2).take_all()}
    assert got == dict(exp_hist)


def test_pair_counts_first_iteration(ray_session):
    """pair_counts over the freshly symbolized histogram == the reference
    first-iteration pair statistics (the oracle-checked surface)."""
    wc = _ref_words(CORPUS)
    exp = Counter()
    for w, c in wc.items():
        for i in range(len(w) - 1):
            exp[(w[i], w[i + 1])] += c
    hist = bpe.symbolize(bpe.word_histogram(_ds(CORPUS)))
    got = {tuple(r["pair"].split("\x1f")): r["cnt"]
           for r in bpe.pair_counts(hist).take_all()}
    assert got == dict(exp)


def test_tiebreak_tuple_order_with_control_chars(ray_session):
    """A count tie between ('a', 'z') and ('a\\x01', 'b') — where the
    merged symbol a\\x01 contains a codepoint BELOW the internal
    separator — must break by (left, right) TUPLE order like the
    reference, not by SEP-joined-string order (which would pick the
    other pair because \\x01 < \\x1f)."""
    corpus = ["a\x01 a\x01 a\x01 a\x01 a\x01",   # ('a','\x01') x7 -> merge 1
              "a\x01b a\x01b az az"]             # then ('a\x01','b') vs
    #                                              ('a','z') tie at 2
    ref_merges, _ = _ref_train(_ref_words(corpus), 3)
    assert ref_merges[0] == ("a", "\x01")
    assert ("a", "z") in ref_merges[1:2]   # tuple order wins the tie
    got = bpe.bpe_train(_ds(corpus), n_merges=3)
    assert got == ref_merges


def test_min_count_stops_early(ray_session):
    # every pair unique -> all counts 1; min_count=2 trains nothing
    ds = _ds(["abc def"])
    assert bpe.bpe_train(ds, n_merges=5, min_count=2) == []
    # and with min_count=1 it merges all the way down to whole words
    merges = bpe.bpe_train(ds, n_merges=10, min_count=1)
    ranks = {m: i for i, m in enumerate(merges)}
    assert bpe.encode_word("abc", ranks) == ["abc"]
    assert bpe.encode_word("def", ranks) == ["def"]


def test_empty_and_null_corpus(ray_session):
    assert bpe.bpe_train(_ds([None, "", "   "]), n_merges=3) == []
    out = bpe.bpe_token_counts(_ds([None, ""]), [], concurrency=1).take_all()
    assert [r["n_bpe_tokens"] for r in out] == [0, 0]
