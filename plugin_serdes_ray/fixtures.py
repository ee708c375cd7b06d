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
    want = {"n_rows": n_rows, "n_shards": n_shards, "seed": seed, "v": 3}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == want:
                return sorted(
                    os.path.join(out_dir, f) for f in os.listdir(out_dir)
                    if f.endswith(".parquet"))
    per = [n_rows // n_shards + (1 if i < n_rows % n_shards else 0)
           for i in range(n_shards)]

    def _write(i: int) -> str:
        t = generate_shard(i, per[i], seed)
        path = os.path.join(out_dir, f"webpages-{i:05d}.parquet")
        pq.write_table(t, path + ".tmp", compression="snappy")
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
