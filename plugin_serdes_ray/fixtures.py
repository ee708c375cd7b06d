"""Deterministic synthetic Common-Crawl-style webpages table (FIXTURES.md F1).

Schema (the north-rule input hint, BASELINE.json):
    url: string, warc_ts: timestamp[us], html: large_binary,
    text: large_string, lang: string

Properties exercised: Zipf-skewed hosts (hot url prefixes -> salting),
mostly-monotone timestamps with jitter (FoR/delta), templated HTML wrapping
text with boilerplate (compressible; some rows multi-hundred-KB), ~0.5%
html nulls, near-duplicate text rows, Zipf lang distribution (en ~60%).

Generation is a pure function of (seed, n_rows, n_shards); shards are
independent (seeded per shard) so generation itself parallelizes and a
cached corpus is reproducible byte-for-byte.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

_WORDS = None


def _word_bank(rng: np.random.Generator) -> np.ndarray:
    consonants = list("bcdfghjklmnpqrstvwz")
    vowels = list("aeiou")
    words = []
    r = np.random.default_rng(SEED)  # word bank is global, not per-shard
    for _ in range(2000):
        k = int(r.integers(2, 6))
        w = "".join(
            consonants[int(r.integers(len(consonants)))] + vowels[int(r.integers(len(vowels)))]
            for _ in range(k)
        )
        words.append(w)
    return np.asarray(words, dtype=object)


_LANGS = [
    "en", "ru", "de", "es", "fr", "ja", "zh", "pt", "it", "pl", "nl", "tr",
    "cs", "vi", "id", "sv", "ar", "el", "ko", "fa", "ro", "hu", "da", "fi",
    "th", "sk", "uk", "no", "he", "bg", "hi", "lt", "hr", "et", "sl", "lv",
    "sr", "ms", "bn", "ca",
]


def _zipf_probs(n: int, s: float) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** s
    return p / p.sum()


def generate_shard(shard_id: int, rows: int, seed: int = SEED) -> pa.Table:
    rng = np.random.default_rng([seed, shard_id])
    global _WORDS
    if _WORDS is None:
        _WORDS = _word_bank(rng)
    words = _WORDS

    host_rng = np.random.default_rng(seed)  # hosts shared across shards
    hosts = np.array(
        [f"www.{''.join(words[host_rng.integers(0, len(words), 2)])}{i}.com"
         for i in range(1000)], dtype=object)
    host_idx = rng.choice(len(hosts), size=rows, p=_zipf_probs(len(hosts), 1.2))
    path_a = rng.integers(0, len(words), rows)
    path_b = rng.integers(0, 10**9, rows)
    urls = np.array(
        [f"https://{hosts[h]}/{words[a]}/{b:09d}.html"
         for h, a, b in zip(host_idx, path_a, path_b)], dtype=object)

    # mostly-monotone crawl timestamps over 30 days, occasional out-of-order
    base = np.datetime64("2025-06-01T00:00:00", "us").astype(np.int64)
    span = 30 * 86400 * 1_000_000
    steps = rng.integers(0, max(2 * span // max(rows, 1), 2), rows)
    ts = base + shard_id * 3600 * 1_000_000 + np.cumsum(steps) % span
    jitter = rng.integers(-5_000_000, 5_000_000, rows)
    ts = ts + jitter

    langs = np.asarray(_LANGS, dtype=object)[
        rng.choice(len(_LANGS), size=rows, p=_zipf_probs(len(_LANGS), 1.4))]

    # text: seeded word sequences; ~5% exact/near dups of earlier rows
    n_words = rng.integers(30, 220, rows)
    texts: list[str] = []
    for i in range(rows):
        idx = rng.integers(0, len(words), int(n_words[i]))
        texts.append(" ".join(words[idx]))
    dup_mask = rng.random(rows) < 0.05
    dup_src = rng.integers(0, rows, rows)
    for i in np.flatnonzero(dup_mask):
        if dup_src[i] < i:
            texts[i] = texts[dup_src[i]]

    big_mask = rng.random(rows) < 0.01  # a few multi-hundred-KB pages
    null_mask = rng.random(rows) < 0.005
    nav = "".join(f'<li><a href="/{w}">{w}</a></li>' for w in words[:25])
    script = "<script>var a=" + "[0,1,2,3,4,5,6,7,8,9];" * 20 + "</script>"
    htmls: list[bytes | None] = []
    for i in range(rows):
        if null_mask[i]:
            htmls.append(None)
            continue
        body = "".join(f"<p>{p}</p>" for p in texts[i].split(" "))
        rep = 40 if big_mask[i] else 1
        page = (
            f"<!DOCTYPE html><html lang={langs[i]}><head><title>{words[path_a[i]]}</title>"
            f"{script}</head><body><nav><ul>{nav}</ul></nav>"
            f"<main>{body * rep}</main>"
            f"<footer>copyright {hosts[host_idx[i]]}</footer></body></html>"
        )
        htmls.append(page.encode())

    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(ts, type=pa.timestamp("us")),
        "html": pa.array(htmls, type=pa.large_binary()),
        "text": pa.array(texts, type=pa.large_string()),
        "lang": pa.array(langs, type=pa.string()),
    })


def generate_webpages(out_dir: str, n_rows: int, n_shards: int,
                      seed: int = SEED, use_ray: bool = False) -> list[str]:
    """Write the corpus as n_shards parquet files; cached by a marker file."""
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_GENERATED.json")
    want = {"n_rows": n_rows, "n_shards": n_shards, "seed": seed, "v": 4}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == want:
                return sorted(
                    os.path.join(out_dir, f) for f in os.listdir(out_dir)
                    if f.endswith(".parquet"))
    # regenerating: drop shards from a previous generation FIRST, or a
    # shard-count decrease leaves stale webpages-*.parquet files that every
    # later cached call returns as part of the corpus
    for name in os.listdir(out_dir):
        if name.endswith(".parquet") or name.endswith(".parquet.tmp"):
            os.remove(os.path.join(out_dir, name))
    if os.path.exists(marker):
        os.remove(marker)   # a crash mid-regenerate must not look cached
    per = [n_rows // n_shards + (1 if i < n_rows % n_shards else 0)
           for i in range(n_shards)]

    def _write(i: int) -> str:
        t = generate_shard(i, per[i], seed)
        path = os.path.join(out_dir, f"webpages-{i:05d}.parquet")
        # uncompressed landing-zone parquet: the bench measures THIS
        # engine's read->encode, not a third-party decompressor saturating
        # the shared memory bus (snappy decode dominated parallel scaling)
        pq.write_table(t, path + ".tmp", compression=None)
        os.replace(path + ".tmp", path)
        return path

    if use_ray:
        import ray
        from .util import package_runtime_env

        @ray.remote(num_cpus=1, runtime_env=package_runtime_env())
        def _gen(i: int) -> str:
            return _write(i)

        files = ray.get([_gen.remote(i) for i in range(n_shards)])
    else:
        files = [_write(i) for i in range(n_shards)]
    with open(marker, "w") as f:
        json.dump(want, f)
    return sorted(files)


def generate_alltypes(rows: int = 1000, seed: int = SEED) -> "pa.Table":
    """FIXTURES.md F2: the reference's 'full' schema — every primitive +
    logical type it converts (/root/reference src/test/resources/csv/full.avsc
    and avro/all.avsc, used by IonToParquetTest.java:42-100)."""
    import decimal

    rng = np.random.default_rng([seed, 99])
    names = np.array([f"name{i}" for i in range(rows)], dtype=object)
    emails = np.array([f"user{rng.integers(10**6)}@ex{i % 7}.com"
                       for i in range(rows)], dtype=object)
    genders = np.array(["Female", "Male"], dtype=object)[rng.integers(0, 2, rows)]
    nullable = np.where(rng.random(rows) < 0.2, None, names)
    decs = [decimal.Decimal(int(rng.integers(-10**6, 10**6))).scaleb(-2)
            for _ in range(rows)]
    fixed = [bytes(rng.integers(0, 256, 8, dtype=np.uint8)) for _ in range(rows)]
    uuids = [f"{rng.integers(16**8):08x}-0000-4000-8000-{rng.integers(16**12):012x}"
             for _ in range(rows)]
    return pa.table({
        "id": pa.array(np.arange(rows, dtype=np.int32)),
        "name": pa.array(names, type=pa.string()),
        "nameNullable": pa.array(nullable, type=pa.string()),
        "email": pa.array(emails, type=pa.string()),
        "enum": pa.array(genders, type=pa.string()).dictionary_encode(),
        "long": pa.array(np.where(rng.random(rows) < 0.1, None,
                                  rng.integers(-(2**62), 2**62, rows)),
                         type=pa.int64()),
        "double": pa.array(rng.standard_normal(rows)),
        "boolean": pa.array(rng.random(rows) < 0.5),
        "date": pa.array(rng.integers(0, 20000, rows).astype(np.int32)).cast(pa.date32()),
        "timeMillis": pa.array(rng.integers(0, 86_400_000, rows).astype(np.int32),
                               type=pa.time32("ms")),
        "timestampMillis": pa.array(rng.integers(0, 2**41, rows),
                                    type=pa.timestamp("ms")),
        "timestampMicros": pa.array(rng.integers(0, 2**44, rows),
                                    type=pa.timestamp("us")),
        "decimal": pa.array(decs, type=pa.decimal128(12, 2)),
        "binary": pa.array([bytes(rng.integers(0, 256, int(n), dtype=np.uint8))
                            for n in rng.integers(0, 64, rows)], type=pa.binary()),
        "fixed": pa.array(fixed, type=pa.binary(8)),
        "uuid": pa.array(uuids, type=pa.string()),
    })


def generate_nested(rows: int = 200, seed: int = SEED) -> "pa.Table":
    """FIXTURES.md F3: struct/list/map coverage (strict_schema_nested.jsonl,
    inference tests FullIonConversionAbstractTest.java:55-156)."""
    rng = np.random.default_rng([seed, 77])
    recs = []
    for i in range(rows):
        r = rng.random()
        if r < 0.1:
            recs.append({"id": None, "str1": None, "labels": None,
                         "data1": None, "attrs": None})
            continue
        recs.append({
            "id": int(i),
            "str1": None if r < 0.3 else f"s{i}",
            "labels": [] if r < 0.5 else [f"l{j}" for j in range(int(rng.integers(1, 4)))],
            "data1": {"field1": f"f{i}"},
            "attrs": [(f"k{j}", f"v{j}") for j in range(int(rng.integers(0, 3)))],
        })
    typ = pa.struct([("field1", pa.string())])
    return pa.table({
        "id": pa.array([r["id"] for r in recs], type=pa.int64()),
        "str1": pa.array([r["str1"] for r in recs], type=pa.string()),
        "labels": pa.array([r["labels"] for r in recs], type=pa.list_(pa.string())),
        "data1": pa.array([r["data1"] for r in recs], type=typ),
        "attrs": pa.array([r["attrs"] for r in recs],
                          type=pa.map_(pa.string(), pa.string())),
    })


def webpages_for_sf(sf_dir: str, cache_root: str = "/tmp/graft_webpages") -> list[str]:
    """Derive a deterministic webpages corpus sized to the given sf dir.

    Shard count is fixed per sf (a pure function of the input), NOT of the
    CPU count — the scaling benchmark requires identical partitioning at
    both parallelism levels (SURVEY.md §4.2)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    try:
        n_li = pq.read_metadata(os.path.join(sf_dir, "lineitem.parquet")).num_rows
    except Exception:
        n_li = 6000
    n_rows = max(n_li // 3, 1000)
    n_shards = max(min(n_rows // 500, 64), 4)
    out_dir = os.path.join(cache_root, tag)
    use_ray = False
    try:
        import ray
        use_ray = ray.is_initialized()
    except Exception:
        pass
    return generate_webpages(out_dir, n_rows, n_shards, use_ray=use_ray)


# ---------------------------------------------------------------------------
# deterministic dedup-oracle corpus (near-dup queries)
# ---------------------------------------------------------------------------

DEDUP_INJECT_BASE = 10**6


def dedup_corpus_text(doc_id: int, n_tokens: int = 200, vocab: int = 50_000,
                      perturb_tokens: int = 6) -> str:
    """Pure function doc_id -> text for the near-dup oracle queries.

    Base ids get a unique random-token text (pairwise Jaccard ~0 across the
    corpus). Ids >= DEDUP_INJECT_BASE are controlled near-duplicates of base
    id ``doc_id - DEDUP_INJECT_BASE``: the last ``perturb_tokens`` of
    ``n_tokens`` tokens are replaced, giving a shingle Jaccard ~0.93 at the
    defaults (>= LSH threshold 0.7 with huge margin) while staying far from
    exact-equal. An oracle can therefore enumerate exactly which ids any
    near-dup operator must drop: the injected ones and nothing else."""
    injected = doc_id >= DEDUP_INJECT_BASE
    base_id = doc_id - DEDUP_INJECT_BASE if injected else doc_id
    rng = np.random.default_rng(982451653 + base_id)
    toks = rng.integers(0, vocab, n_tokens)
    if injected and perturb_tokens:
        alt = np.random.default_rng(15485863 + base_id)
        toks[-perturb_tokens:] = alt.integers(0, vocab, perturb_tokens)
    # render as letter words with UNIFORM letters: low-entropy renderings
    # (digits, or base-26 of a small id) share so many char k-grams across
    # unrelated docs that their simhashes correlate (measured hamming ~2 at
    # Jaccard 0.03); an odd-constant multiply is bijective mod 2^32 so
    # distinct token ids stay distinct words
    def word(v: int) -> str:
        m = (v * 2654435761) % (1 << 32)
        return "".join(chr(97 + (m // 26**j) % 26) for j in range(7))
    return " ".join(word(int(v)) for v in toks)


def dedup_corpus_table(base_ids: list[int], n_injected: int,
                       perturb_tokens: int = 6) -> "pa.Table":
    """(doc_id, text) table: every base id plus n_injected near-dups of the
    smallest base ids, under ids >= DEDUP_INJECT_BASE."""
    lows = sorted(base_ids)[:n_injected]
    all_ids = list(base_ids) + [DEDUP_INJECT_BASE + i for i in lows]
    texts = [dedup_corpus_text(i, perturb_tokens=perturb_tokens) for i in all_ids]
    return pa.table({"doc_id": pa.array(all_ids, type=pa.int64()),
                     "text": pa.array(texts, type=pa.large_string())})
