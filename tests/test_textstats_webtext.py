"""Webtext-pipeline ops: vocabulary top-k, PII redaction, repetition ratio."""

import pyarrow as pa


def test_vocab_top_k_tf_and_df_vs_sql(ray_session, sf_dir):
    import duckdb
    import ray.data

    from plugin_serdes_ray.pipelines.textstats import vocab_top_k

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    got_tf = vocab_top_k(docs, "text", k=15)
    want_tf = duckdb.sql(rf"""
        SELECT token, count(*)::BIGINT AS cnt FROM (
            SELECT unnest(regexp_split_to_array(coalesce(text,''), '\s+'))
                AS token
            FROM read_parquet('{sf_dir}/documents.parquet'))
        WHERE token <> '' GROUP BY token
        ORDER BY cnt DESC, token LIMIT 15""").arrow()
    assert got_tf.to_pylist() == want_tf.to_pylist()

    got_df = vocab_top_k(docs, "text", k=15, document_frequency=True)
    want_df = duckdb.sql(rf"""
        SELECT token, count(DISTINCT doc_id)::BIGINT AS cnt FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(coalesce(text,''), '\s+'))
                AS token
            FROM read_parquet('{sf_dir}/documents.parquet'))
        WHERE token <> '' GROUP BY token
        ORDER BY cnt DESC, token LIMIT 15""").arrow()
    assert got_df.to_pylist() == want_df.to_pylist()
    # df never exceeds tf for the same token set
    tf = dict(zip(got_tf.column("token").to_pylist(),
                  got_tf.column("cnt").to_pylist()))
    for tok, cnt in zip(got_df.column("token").to_pylist(),
                        got_df.column("cnt").to_pylist()):
        assert cnt <= tf.get(tok, 10**18)


def test_pii_redact_real_patterns():
    from plugin_serdes_ray.pipelines.textstats import pii_redact

    t = pa.table({"text": [
        "mail john.doe+x@exam-ple.org or alice@sub.domain.co",
        "server 10.0.0.1 backup 192.168.1.100 port 8080",
        "call +1 (415) 555-0199 or +44 20 7946 0958 now",
        "no pii here 3.14 v2.0",
        None]})
    out = pii_redact(t, "text").column("text").to_pylist()
    assert out[0] == "mail <EMAIL> or <EMAIL>"
    assert out[1] == "server <IP> backup <IP> port 8080"
    assert out[2] == "call <PHONE> or <PHONE> now"
    assert out[3] == "no pii here 3.14 v2.0"   # versions/floats untouched
    assert out[4] is None


def test_repetition_ratio_cases():
    from plugin_serdes_ray.pipelines.textstats import repetition_ratio

    t = pa.table({"text": ["a\nb\na\na", "x\ny\nz", "", None, "q\nq"]})
    out = repetition_ratio(t, "text").column("rep_line_ratio").to_pylist()
    assert out[0] == 0.5        # 4 lines, 2 distinct
    assert out[1] == 0.0
    assert out[2] == 0.0 and out[3] == 0.0
    assert out[4] == 0.5


def test_tfidf_top_terms_vs_sql(ray_session, sf_dir):
    import duckdb
    import ray.data

    from plugin_serdes_ray.pipelines.textstats import tfidf_top_terms

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    got = pa.Table.from_pylist(tfidf_top_terms(docs, k=2).take_all())
    got = got.select(["doc_id", "token", "score"]).sort_by(
        [("doc_id", "ascending"), ("score", "descending"),
         ("token", "ascending")])
    want = duckdb.sql(rf"""
        WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(
                          lower(coalesce(text,'')), '\s+')) AS token
                      FROM read_parquet('{sf_dir}/documents.parquet')),
             t2 AS (SELECT * FROM toks WHERE token <> ''),
             tf AS (SELECT doc_id, token, count(*)::DOUBLE tf
                    FROM t2 GROUP BY 1, 2),
             df AS (SELECT token AS dtoken,
                           count(DISTINCT doc_id)::DOUBLE df
                    FROM t2 GROUP BY 1),
             n AS (SELECT count(*)::DOUBLE n
                   FROM read_parquet('{sf_dir}/documents.parquet'))
        SELECT tf.doc_id, tf.token, tf.tf * ln(n.n / df.df) AS score
        FROM tf, n JOIN df ON tf.token = df.dtoken
        QUALIFY row_number() OVER (PARTITION BY tf.doc_id
            ORDER BY score DESC, tf.token) <= 2
        ORDER BY doc_id, score DESC, token""").arrow()
    assert got.num_rows == want.num_rows
    for a, b in zip(got.to_pylist(), want.to_pylist()):
        for kk, x in a.items():
            y = b[kk]
            if isinstance(x, float):
                assert abs(x - y) <= 1e-9 * max(1.0, abs(y))
            else:
                assert x == y


def test_tfidf_salting_engages_and_matches(ray_session):
    """With a tiny salt target the stopword-grade token actually gets salt
    subkeys in the hash_join; results must be identical to the unsalted
    run (replicated right side, every pair meets exactly once)."""
    import ray.data

    from plugin_serdes_ray.pipelines.textstats import tfidf_top_terms

    texts = [f"the doc{i} unique{i} word" for i in range(40)]
    t = pa.table({"doc_id": list(range(40)), "text": texts})
    docs = ray.data.from_arrow(t)
    base = pa.Table.from_pylist(
        tfidf_top_terms(docs, k=2).take_all()).sort_by(
        [("doc_id", "ascending"), ("token", "ascending")])
    salted = pa.Table.from_pylist(
        tfidf_top_terms(docs, k=2, salt_target_bytes=64).take_all()).sort_by(
        [("doc_id", "ascending"), ("token", "ascending")])
    assert base.num_rows == salted.num_rows == 80
    assert base.column("token").to_pylist() == \
        salted.column("token").to_pylist()
    for a, b in zip(base.column("score").to_pylist(),
                    salted.column("score").to_pylist()):
        assert abs(a - b) < 1e-12


def test_unigram_logprob_vs_sql(ray_session, sf_dir):
    import duckdb
    import ray.data

    from plugin_serdes_ray.pipelines.textstats import unigram_logprob

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    got = pa.Table.from_pylist(unigram_logprob(docs).take_all()) \
        .select(["doc_id", "n_tokens", "avg_neg_logp"]).sort_by("doc_id")
    want = duckdb.sql(rf"""
        WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(
                          lower(coalesce(text,'')), '\s+')) AS token
                      FROM read_parquet('{sf_dir}/documents.parquet')),
             t2 AS (SELECT * FROM toks WHERE token <> ''),
             tf AS (SELECT doc_id, token, count(*)::DOUBLE tf
                    FROM t2 GROUP BY 1, 2),
             cnt AS (SELECT token AS ctoken, count(*)::DOUBLE cnt
                     FROM t2 GROUP BY 1),
             n AS (SELECT count(*)::DOUBLE n FROM t2)
        SELECT tf.doc_id, sum(tf.tf)::BIGINT AS n_tokens,
               sum(tf.tf * (ln(n.n) - ln(cnt.cnt))) / sum(tf.tf)
                   AS avg_neg_logp
        FROM tf, n JOIN cnt ON tf.token = cnt.ctoken
        GROUP BY tf.doc_id ORDER BY doc_id""").arrow()
    assert got.num_rows == want.num_rows
    assert got.column("doc_id").to_pylist() == \
        want.column("doc_id").to_pylist()
    assert got.column("n_tokens").to_pylist() == \
        want.column("n_tokens").to_pylist()
    for x, y in zip(got.column("avg_neg_logp").to_pylist(),
                    want.column("avg_neg_logp").to_pylist()):
        assert abs(x - y) <= 1e-9 * max(1.0, abs(y))


def test_unigram_logprob_salting_and_empty(ray_session):
    """Tiny salt target forces skew salts on the hot token; scores must
    match the unsalted run. Empty/None docs emit no row."""
    import ray.data

    from plugin_serdes_ray.pipelines.textstats import unigram_logprob

    texts = [f"the doc{i} word" for i in range(30)] + ["", None]
    t = pa.table({"doc_id": list(range(32)), "text": texts})
    docs = ray.data.from_arrow(t)
    base = pa.Table.from_pylist(unigram_logprob(docs).take_all()) \
        .sort_by("doc_id")
    assert base.num_rows == 30          # empty/null docs drop
    salted = pa.Table.from_pylist(
        unigram_logprob(docs, salt_target_bytes=64).take_all()) \
        .sort_by("doc_id")
    assert base.column("doc_id").to_pylist() == \
        salted.column("doc_id").to_pylist()
    for a, b in zip(base.column("avg_neg_logp").to_pylist(),
                    salted.column("avg_neg_logp").to_pylist()):
        assert abs(a - b) < 1e-12


def test_normalize_text_forms_and_whitespace():
    from plugin_serdes_ray.pipelines.textstats import normalize_text

    decomposed = "étude"            # e + combining acute
    composed = "étude"               # é precomposed
    t = pa.table({"text": [decomposed, composed, "  a \t b\n\nc ", None,
                           "ﬁne"]})  # ﬁ ligature (NFKC-only)
    nfc = normalize_text(t, "text", form="NFC").column("text").to_pylist()
    assert nfc[0] == nfc[1] == composed
    assert nfc[3] is None
    assert nfc[4] == "ﬁne"           # NFC keeps the ligature
    nfkc = normalize_text(t, "text", form="NFKC").column("text").to_pylist()
    assert nfkc[4] == "fine"              # NFKC folds it
    ws = normalize_text(t, "text", collapse_whitespace=True) \
        .column("text").to_pylist()
    assert ws[2] == "a b c"
    import pytest
    with pytest.raises(ValueError):
        normalize_text(t, "text", form="XXX")


def test_fingerprint_goldens_and_no_warnings():
    """Pinned golden fingerprints: the vectorized xor-fold must be
    output-identical to the original scalar loop, and emit no
    RuntimeWarning (VERDICT r3 #2/#4)."""
    import warnings

    from plugin_serdes_ray.pipelines.textstats import fingerprint

    texts = ["the quick brown fox jumps over the lazy dog",
             "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
             "short", "", None,
             "Szia világ! Unicode ✓ teszt szöveg, hosszabb mint a k ablak."]
    t = pa.table({"text": pa.array(texts, type=pa.string())})
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        got = fingerprint(t).column("fingerprint").to_pylist()
    assert got == [3552706457285291290, -2270066260617185072, 2401800354,
                   0, 0, -3075871091645813566]


def test_normalize_ascii_fast_path_mixed_batch():
    """A batch mixing ASCII, decomposed, and already-NFC rows normalizes
    identically through the vectorized ASCII pre-mask (VERDICT r3 #5)."""
    import unicodedata

    from plugin_serdes_ray.pipelines.textstats import normalize_text

    decomposed = "étude"
    t = pa.table({"text": ["plain ascii", decomposed, "étude", None,
                           "more ascii rows", "ascii + café"]})
    out = normalize_text(t, "text", form="NFC").column("text").to_pylist()
    assert out[0] == "plain ascii"
    assert out[1] == out[2] == unicodedata.normalize("NFC", decomposed)
    assert out[3] is None
    assert out[5] == "ascii + café"
    # pure-ASCII batch: identity (fast path returns the column untouched)
    t2 = pa.table({"text": ["abc", "def", None]})
    assert normalize_text(t2, "text", form="NFKD") \
        .column("text").to_pylist() == ["abc", "def", None]


def test_gopher_signals_small_cases():
    from plugin_serdes_ray.pipelines.textstats import gopher_signals

    t = pa.table({"text": [
        "a b\na b\nc",              # duplicate line 'a b' (3 chars)
        "- item one\n* item two\nplain...",
        "w x w x w x",              # heavy 2-gram repetition
        None, ""]})
    g = gopher_signals(t)
    assert g.column("total_lines").to_pylist() == [3, 3, 1, 0, 1]
    assert g.column("dup_line_chars").to_pylist()[0] == 3
    assert g.column("bullet_lines").to_pylist()[1] == 2
    assert g.column("ellipsis_lines").to_pylist()[1] == 1
    assert g.column("word_count").to_pylist() == [5, 7, 6, 0, 0]
    # 'w x w x w x': 2-grams = [w x, x w, w x, x w, w x] -> dup chars =
    # (3-1)*3 + (2-1)*3 = 9; total = 5*3 = 15
    assert g.column("dup_2gram_chars").to_pylist()[2] == 9
    assert g.column("tot_2gram_chars").to_pylist()[2] == 15
    # null row is all zeros
    assert all(g.column(c).to_pylist()[3] == 0 for c in g.column_names
               if c != "text")


def test_contamination_overlap_matches_sql(ray_session):
    """Per-doc distinct n-gram overlap vs a benchmark set == the SQL
    formulation (regexp_split tokenization, distinct grams, left-join
    membership), including repeated grams, short docs, and nulls."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from plugin_serdes_ray.pipelines.textstats import contamination_overlap

    docs = pa.table({
        "doc_id": pa.array(list(range(1, 8)), type=pa.int64()),
        "text": pa.array([
            "a b c d e f",                  # bench doc
            "x y z a b c d",                # partial overlap
            "a b c a b c a b c",            # repeated grams
            "completely different words here now",
            "a  b\tc   d e f",              # messy whitespace, same grams
            None,                           # null text
            "tiny",                         # shorter than n
        ])})
    ds = ray.data.from_arrow(docs).repartition(3)
    bench = ray.data.from_arrow(docs.filter(
        pa.compute.equal(docs.column("doc_id"), 1)))
    out = contamination_overlap(ds, bench, n=3)
    got = sorted((r["doc_id"], r["n_grams"], r["n_overlap"])
                 for r in out.take_all())
    want = duckdb.sql(r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(coalesce(text, ''),
                                                   '\s+'),
                             x -> x <> '') AS w
          FROM docs),
        grams AS (
          SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
          FROM toks, unnest(generate_series(1, len(w) - 2)) AS u(i)),
        dg AS (SELECT DISTINCT doc_id, g FROM grams),
        bench AS (SELECT DISTINCT g FROM grams WHERE doc_id = 1),
        cnt AS (
          SELECT dg.doc_id, count(*) AS n_grams,
                 sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
                     AS n_overlap
          FROM dg LEFT JOIN bench b USING (g) GROUP BY dg.doc_id)
        SELECT d.doc_id, CAST(coalesce(c.n_grams, 0) AS BIGINT),
               CAST(coalesce(c.n_overlap, 0) AS BIGINT)
        FROM docs d LEFT JOIN cnt c USING (doc_id) ORDER BY d.doc_id
    """).fetchall()
    assert got == [tuple(r) for r in want]
    # doc 5's messy whitespace normalizes to doc 1's grams -> full overlap
    by_id = {d: (g, o) for d, g, o in got}
    assert by_id[5] == (4, 4)
    assert by_id[6] == (0, 0) and by_id[7] == (0, 0)


def test_chunk_text_matches_python_reference(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.textstats import chunk_text

    size, overlap = 7, 3
    stride = size - overlap
    texts = ["", "a", "héllo wörld açcénts", "x" * 20, None, "abcdefg",
             "abcdefgh", "yz" * 50]
    want = []
    for i, t in enumerate(texts):
        if t is None:
            continue
        n = max(1, -(-(len(t) - size) // stride) + 1)
        for j in range(n):
            want.append((i, j, t[j * stride:j * stride + size]))
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    ds = ray.data.from_arrow(t).repartition(3)
    out = chunk_text(ds, size=size, overlap=overlap)
    got = sorted((r["doc_id"], r["chunk_id"], r["chunk"])
                 for r in out.take_all())
    assert got == sorted(want)
    # overlap reconstruction: dropping the first `overlap` chars of every
    # chunk after the first re-concatenates to the original text
    by_doc = {}
    for d, j, c in got:
        by_doc.setdefault(d, []).append((j, c))
    for i, t_ in enumerate(texts):
        if t_ is None:
            continue
        parts = [c if j == 0 else c[overlap:]
                 for j, c in sorted(by_doc[i])]
        assert "".join(parts) == t_


def test_chunk_text_vs_sql(ray_session, sf_dir):
    import duckdb
    import ray.data

    from plugin_serdes_ray.pipelines.textstats import chunk_text

    size, overlap, stride = 200, 40, 160
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    got = sorted((r["doc_id"], r["chunk_id"], r["chunk"])
                 for r in chunk_text(docs, size=size,
                                     overlap=overlap).take_all())
    want = duckdb.sql(f"""
        WITH base AS (
            SELECT doc_id, text,
                   greatest(1, (length(text) - {size} + {stride} - 1)
                               // {stride} + 1) AS n
            FROM read_parquet('{sf_dir}/documents.parquet')
            WHERE text IS NOT NULL),
        expanded AS (
            SELECT doc_id, text,
                   unnest(generate_series(0, n - 1)) AS j FROM base)
        SELECT doc_id, j AS chunk_id,
               substr(text, CAST(j * {stride} + 1 AS BIGINT), {size})
                 AS chunk
        FROM expanded ORDER BY doc_id, chunk_id""").fetchall()
    assert got == [tuple(r) for r in want]


def test_gopher_filter_thresholds():
    from plugin_serdes_ray.pipelines.textstats import (gopher_filter,
                                                       gopher_signals)

    clean = " ".join(f"word{i}" for i in range(80))
    too_short = "just a few words"
    bullets = "\n".join(f"- item {i}" for i in range(60))
    repeated = ("same line of text here\n" * 40
                + " ".join(f"w{i}" for i in range(60)))
    symbols = " ".join(["word", "#", "#", "#"] * 30)
    batch = pa.table({
        "doc_id": pa.array(range(5), type=pa.int64()),
        "text": pa.array([clean, too_short, bullets, repeated, symbols])})
    out = gopher_filter(gopher_signals(batch))
    assert out.column("keep").to_pylist() == [True, False, False, False,
                                              False]
    # zero denominators (empty text) fail only the word-count bound
    empty = gopher_filter(gopher_signals(pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array([""])})), min_words=0)
    assert empty.column("keep").to_pylist() == [True]


def test_bigram_logprob_matches_sql(ray_session, sf_dir):
    import duckdb
    import ray.data

    from plugin_serdes_ray.pipelines.textstats import bigram_logprob

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    got = {r["doc_id"]: (r["n_bigrams"], round(r["avg_neg_logp"], 9))
           for r in bigram_logprob(docs).take_all()}
    want = duckdb.sql(rf"""
        WITH toks AS (SELECT doc_id,
                 list_filter(regexp_split_to_array(
                     lower(coalesce(text, '')), '\s+'), x -> x <> '') AS w
               FROM read_parquet('{sf_dir}/documents.parquet')),
        grams AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS g, w[i] AS p
                  FROM toks, unnest(generate_series(1, len(w) - 1))
                      AS u(i)),
        tf AS (SELECT doc_id, g, p, count(*)::DOUBLE tf
               FROM grams GROUP BY 1, 2, 3),
        cg AS (SELECT g AS gg, sum(tf) cg FROM tf GROUP BY 1),
        cp AS (SELECT p AS pp, sum(tf) cp FROM tf GROUP BY 1)
        SELECT tf.doc_id, sum(tf.tf)::BIGINT,
               round(sum(tf.tf * (ln(cp.cp) - ln(cg.cg))) / sum(tf.tf), 9)
        FROM tf JOIN cg ON tf.g = cg.gg JOIN cp ON tf.p = cp.pp
        GROUP BY tf.doc_id""").fetchall()
    assert got == {d: (n, v) for d, n, v in want}


def test_bigram_logprob_edge_docs(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.textstats import bigram_logprob

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["one", "", None, "a b a b a b",
                          "a b"])})
    out = {r["doc_id"]: r for r in
           bigram_logprob(ray.data.from_arrow(t).repartition(3))
           .take_all()}
    # <2 tokens -> no row
    assert set(out) == {3, 4}
    assert out[3]["n_bigrams"] == 5   # 'a b' x3 + 'b a' x2
    # repeated 'a b' in doc3 + doc4: cnt('a b')=4, cnt(prefix 'a')=4;
    # 'b a': cnt=2, prefix 'b' starts 2 bigrams -> all conditionals = 1
    assert abs(out[3]["avg_neg_logp"]) < 1e-12
    assert abs(out[4]["avg_neg_logp"]) < 1e-12


def test_canonicalize_text_dedup_key():
    from plugin_serdes_ray.pipelines.textstats import canonicalize_text

    batch = pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()),
        "text": pa.array([
            "Hello,   World!",
            "hello world",
            "HELLO - WORLD???",
            "  hello\tworld 42 ",
            None,
            "héllo wörld",
        ])})
    out = canonicalize_text(batch)
    got = out.column("text_canonical").to_pylist()
    # reformatted copies canonicalize EQUAL (the dedup-key property)
    assert got[0] == got[1] == got[2] == got[3] == "hello world"
    assert got[4] is None
    # non-ASCII letters survive, case folds
    assert got[5] == "héllo wörld"
    # punctuation-only text canonicalizes to empty
    only = canonicalize_text(pa.table({
        "text": pa.array(["!!! ... ???", ""])}))
    assert only.column("text_canonical").to_pylist() == ["", ""]


def test_vocab_top_p_inclusion_boundaries(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.textstats import vocab_top_p

    ds = ray.data.from_arrow(pa.table({
        "text": ["a a a a b b c", "a b d", None, ""]})).repartition(3)
    # counts: a=5 b=3 c=1 d=1 (total 10); inclusion = exclusive prefix
    # mass < p * total under (count DESC, token ASC) order
    for p, want in [(0.5, {"a"}), (0.51, {"a", "b"}), (0.8, {"a", "b"}),
                    (0.81, {"a", "b", "c"}), (1.0, {"a", "b", "c", "d"}),
                    (0.0, set())]:
        got = {r["token"] for r in vocab_top_p(ds, p=p).take_all()}
        assert got == want, (p, got, want)
    # tie order: equal counts cut by token ASC (c before d at the margin)
    got = {(r["token"], r["n"])
           for r in vocab_top_p(ds, p=0.85).take_all()}
    assert got == {("a", 5), ("b", 3), ("c", 1)}


def test_vocab_top_p_empty_corpus(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.textstats import vocab_top_p

    ds = ray.data.from_arrow(pa.table({"text": pa.array(
        [None, ""], type=pa.string())}))
    assert vocab_top_p(ds, p=0.9).take_all() == []


def test_importance_weights_reference(ray_session):
    import math

    import ray.data

    from plugin_serdes_ray.pipelines.textstats import importance_weights

    # target favors 'cat'; source favors 'dog'. vocab_k=2 -> V={cat,dog}
    # (target tf: cat 3, dog 1; 'bird' never makes the vocabulary).
    target = ray.data.from_arrow(pa.table({
        "doc_id": [100, 101],
        "text": ["cat cat", "cat dog"]}))
    src = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["dog dog cat", "bird bird", None, "cat"]})
    out = importance_weights(
        ray.data.from_arrow(src).repartition(2), target,
        vocab_k=2).take_all()
    got = {r["doc_id"]: (r["n_vocab"], r["log_ratio"]) for r in out}
    # source vocab counts: dog 2, cat 2 (doc2/3 contribute nothing)
    pt = {"cat": (3 + 1) / (4 + 2), "dog": (1 + 1) / (4 + 2)}
    ps = {"cat": (2 + 1) / (4 + 2), "dog": (2 + 1) / (4 + 2)}
    lr = {w: math.log(pt[w]) - math.log(ps[w]) for w in pt}
    assert got[2] == (0, None) and got[3] == (0, None)
    assert got[4][0] == 1 and abs(got[4][1] - lr["cat"]) < 1e-12
    assert got[1][0] == 3
    assert abs(got[1][1] - (2 * lr["dog"] + lr["cat"])) < 1e-12


def test_pmi_collocations_hand_case(ray_session):
    """Hand-checkable corpus: 'big data' always collocates, 'the'
    pairs with everything (low PMI), rare pairs fall to min_count."""
    import math

    import ray.data

    from plugin_serdes_ray.pipelines.textstats import pmi_collocations

    docs = [{"doc_id": i, "text": "Big Data beats the rest"}
            for i in range(6)]
    docs += [{"doc_id": 100 + i, "text": "the rest is noise"}
             for i in range(6)]
    docs += [{"doc_id": 200, "text": "rare pair"}]  # c12=1 < min_count
    ds = ray.data.from_items(docs).repartition(3)
    got = pmi_collocations(ds, k=50, min_count=5)
    rows = {r["gram"]: r for r in got.to_pylist()}
    assert "rare pair" not in rows
    # counts: 6x(5 tok, 4 bg) + 6x(4 tok, 3 bg) + (2 tok, 1 bg)
    n1, n2 = 56.0, 43.0
    exp = round(math.log(6) - math.log(n2) - math.log(6)
                + math.log(n1) - math.log(6) + math.log(n1), 9)
    assert rows["big data"]["c12"] == 6
    assert rows["big data"]["pmi"] == exp
    # 'the rest' occurs 12x but 'the'/'rest' are corpus-wide frequent
    assert rows["the rest"]["c12"] == 12
    assert rows["the rest"]["pmi"] < rows["big data"]["pmi"]
    # ordering contract: pmi desc, gram asc
    lst = got.to_pylist()
    assert lst == sorted(lst, key=lambda r: (-r["pmi"], r["gram"]))


def test_pmi_collocations_empty_and_all_rare(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.textstats import pmi_collocations

    ds = ray.data.from_items([{"doc_id": 1, "text": None},
                              {"doc_id": 2, "text": "   "},
                              {"doc_id": 3, "text": "one two"}])
    got = pmi_collocations(ds, k=5, min_count=5)
    assert got.num_rows == 0
    assert got.column_names == ["gram", "c12", "pmi"]
    assert got.schema.field("c12").type == pa.int64()


def test_vocab_kl_single_group_is_zero(ray_session):
    """One group == the corpus, so P_g == P and every term cancels to
    exactly 0.0 (same floats both sides of the subtraction)."""
    import ray.data

    from plugin_serdes_ray.pipelines.textstats import vocab_kl_divergence

    ds = ray.data.from_items(
        [{"lang": "en", "text": "a b c a"},
         {"lang": "en", "text": "b c d"},
         {"lang": None, "text": "excluded row"}]).repartition(2)
    rows = vocab_kl_divergence(ds).take_all()
    assert rows == [{"lang": "en", "n_tokens": 7, "kl": 0.0}]


def test_vocab_kl_reference_and_empty(ray_session):
    """Two-group corpus vs a direct numpy recomputation of the same
    formula; empty corpus returns the typed empty result."""
    import math

    import ray.data

    from plugin_serdes_ray.pipelines.textstats import vocab_kl_divergence

    ds = ray.data.from_items(
        [{"lang": "en", "text": "x x y"},
         {"lang": "de", "text": "z z z y"}]).repartition(2)
    rows = sorted(vocab_kl_divergence(ds).take_all(),
                  key=lambda r: r["lang"])
    # vocab = {x, y, z}: V=3, N=7; counts en: x2 y1 z0 (n=3),
    # de: x0 y1 z3 (n=4)
    def kl(cs, n):
        tot = {"x": 2.0, "y": 2.0, "z": 3.0}
        s = 0.0
        for t in ("x", "y", "z"):
            pg = (cs.get(t, 0.0) + 1) / (n + 3.0)
            s += pg * ((math.log(cs.get(t, 0.0) + 1) - math.log(n + 3.0))
                       - (math.log(tot[t] + 1) - math.log(7 + 3.0)))
        return round(s, 9)

    assert rows[0]["lang"] == "de" and rows[0]["n_tokens"] == 4
    assert abs(rows[0]["kl"] - kl({"y": 1.0, "z": 3.0}, 4.0)) <= 1e-9
    assert rows[1]["lang"] == "en" and rows[1]["n_tokens"] == 3
    assert abs(rows[1]["kl"] - kl({"x": 2.0, "y": 1.0}, 3.0)) <= 1e-9
    assert all(r["kl"] > 0 for r in rows)

    empty = ray.data.from_items([{"lang": None, "text": "only null"}])
    got = vocab_kl_divergence(empty).take_all()
    assert got == []


def test_c4_signals_rules():
    from plugin_serdes_ray.pipelines.textstats import c4_signals

    t = pa.table({"text": [
        "Good line with words here.\nshort.\nno terminal punct\n"
        "Another proper sentence!",
        "Uses JavaScript heavily here.\nThis line is safe and long.",
        "Has lorem ipsum dolor sit amet.",
        "var x = { a: 1 };\nA fine sentence indeed.",
        'Ends with a quote."\nEnds with smart quote.”\nEnds with question?',
        None]})
    out = c4_signals(t)
    rows = out.to_pylist()
    assert rows[0]["c4_text"] == ("Good line with words here.\n"
                                  "Another proper sentence!")
    assert rows[0]["c4_total_lines"] == 4
    assert rows[0]["c4_kept_lines"] == 2
    assert rows[0]["c4_keep_page"] is True
    assert rows[1]["c4_text"] == "This line is safe and long."  # js dropped
    assert rows[2]["c4_keep_page"] is False                     # lorem
    assert rows[3]["c4_keep_page"] is False                     # curly
    # quote/smart-quote/question all count as terminal punctuation
    assert rows[4]["c4_kept_lines"] == 3
    assert rows[5]["c4_text"] == "" and rows[5]["c4_kept_lines"] == 0
    assert rows[5]["c4_total_lines"] == 1 and rows[5]["c4_keep_page"]


def test_token_entropy_known_values():
    from plugin_serdes_ray.pipelines.textstats import token_entropy

    t = pa.table({"text": pa.array([
        "a a b b",            # two tokens, 50/50 -> 1 bit
        "spam spam spam",     # degenerate -> 0
        "A  a\tB b",          # case-fold + multi-whitespace -> 1 bit
        "w x y z",            # uniform over 4 -> 2 bits
        "", None,             # empty/null -> 0
    ])})
    out = token_entropy(t).column("token_entropy").to_pylist()
    import numpy as np
    np.testing.assert_allclose(out, [1.0, 0.0, 1.0, 2.0, 0.0, 0.0],
                               atol=1e-12)
    # sign bit: the degenerate case must be +0.0, not -0.0 (value-hash
    # compares care)
    assert str(out[1]) == "0.0"
