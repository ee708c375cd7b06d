"""Text analysis stages over a document table: language ID (n-gram /
stopword heuristic), quality scoring, token counting, fingerprinting.

Every function is a vectorized batch transform suitable for
``ds.map_batches(fn, batch_format="pyarrow")``; heavier per-call state
(compiled regexes, profile tables) lives at module import, once per worker
process — the moral equivalent of the reference's cached DateTimeFormatters
(/root/reference avro/AvroConverter.java:95-108, pinned by
FormatterCachingTest).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import regex

# BPE-ish pre-tokenizer (the public GPT-2 pattern — a word/number/punct
# splitter), compiled once per process
_BPE_SPLIT = regex.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+")

# tiny deterministic stopword profiles for the language-ID heuristic
_LANG_STOPWORDS: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "was", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "von"},
    "fr": {"le", "la", "et", "les", "des", "est", "pas", "une", "dans", "que"},
    "es": {"el", "la", "de", "que", "y", "los", "en", "un", "por", "con"},
    "it": {"il", "di", "che", "la", "e", "per", "un", "del", "con", "non"},
    "pt": {"o", "de", "que", "e", "do", "da", "em", "um", "para", "com"},
    "nl": {"de", "het", "een", "van", "en", "dat", "is", "op", "te", "niet"},
    "ru": {"и", "в", "не", "на", "что", "с", "он", "как", "это", "по"},
}


def token_counts(batch: pa.Table, column: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish sub-token count per row."""
    texts = batch.column(column).to_pylist()
    ws = [0 if t is None else len(t.split()) for t in texts]
    bpe = [0 if t is None else len(_BPE_SPLIT.findall(t)) for t in texts]
    return batch.append_column("ws_tokens", pa.array(ws, type=pa.int64())) \
                .append_column("bpe_tokens", pa.array(bpe, type=pa.int64()))


def quality_scores(batch: pa.Table, column: str = "text") -> pa.Table:
    """Heuristic document-quality features: length, alpha ratio, punctuation
    ratio, stopword ratio, mean word length, and a combined [0,1] score."""
    texts = batch.column(column).to_pylist()
    n = len(texts)
    length = np.zeros(n, np.int64)
    alpha_ratio = np.zeros(n)
    punct_ratio = np.zeros(n)
    stop_ratio = np.zeros(n)
    mean_wlen = np.zeros(n)
    for i, t in enumerate(texts):
        if not t:
            continue
        b = np.frombuffer(t.encode("utf-8", "replace"), dtype=np.uint8)
        length[i] = len(t)
        is_alpha = ((b >= 65) & (b <= 90)) | ((b >= 97) & (b <= 122)) | (b >= 128)
        alpha_ratio[i] = is_alpha.mean()
        punct = np.isin(b, np.frombuffer(b"!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~", np.uint8))
        punct_ratio[i] = punct.mean()
        words = t.lower().split()
        if words:
            en_stops = _LANG_STOPWORDS["en"]
            stop_ratio[i] = sum(1 for w in words if w in en_stops) / len(words)
            mean_wlen[i] = float(np.mean([len(w) for w in words]))
    score = np.clip(
        0.3 * (np.clip(length, 0, 2000) / 2000)
        + 0.3 * alpha_ratio
        + 0.2 * (1.0 - np.clip(punct_ratio * 5, 0, 1))
        + 0.2 * np.clip(mean_wlen / 8, 0, 1),
        0, 1)
    out = batch
    for name, arr in (("q_length", length), ("q_alpha", alpha_ratio),
                      ("q_punct", punct_ratio), ("q_stop", stop_ratio),
                      ("q_mean_wlen", mean_wlen), ("q_score", score)):
        out = out.append_column(name, pa.array(arr))
    return out


def detect_language(batch: pa.Table, column: str = "text") -> pa.Table:
    """Stopword-overlap language heuristic -> (lang_pred, lang_conf)."""
    texts = batch.column(column).to_pylist()
    preds, confs = [], []
    for t in texts:
        if not t:
            preds.append(None)
            confs.append(0.0)
            continue
        words = set(t.lower().split()[:400])
        best, best_hits = "unknown", 0
        for lang, stops in _LANG_STOPWORDS.items():
            hits = len(words & stops)
            if hits > best_hits:
                best, best_hits = lang, hits
        preds.append(best if best_hits else "unknown")
        confs.append(best_hits / 10.0)
    return batch.append_column("lang_pred", pa.array(preds, type=pa.string())) \
                .append_column("lang_conf", pa.array(confs, type=pa.float64()))


def fingerprint(batch: pa.Table, column: str = "text", k: int = 8,
                window: int = 16) -> pa.Table:
    """Winnowing-style document fingerprint: rolling k-gram hashes, minimum
    per window, xor-folded to one int64 per document."""
    texts = batch.column(column).to_pylist()
    fps = []
    for t in texts:
        if not t:
            fps.append(0)
            continue
        b = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.uint64)
        if len(b) < k:
            fps.append(int(zlib.crc32(t.encode())))
            continue
        base = np.uint64(1099511628211)
        powers = base ** np.arange(k, dtype=np.uint64)
        windows_v = np.lib.stride_tricks.sliding_window_view(b, k)
        hashes = (windows_v * powers).sum(axis=1, dtype=np.uint64)
        if len(hashes) >= window:
            mins = np.lib.stride_tricks.sliding_window_view(hashes, window).min(axis=1)
        else:
            mins = hashes
        acc = np.uint64(0)
        for m in np.unique(mins):
            acc ^= m * np.uint64(0x9E3779B97F4A7C15)
        fps.append(int(acc.astype(np.int64)))
    return batch.append_column("fingerprint", pa.array(fps, type=pa.int64()))


def analyze(ds, column: str = "text"):
    """Full text-analysis pipeline: tokens + quality + language + fingerprint."""
    from ..util import package_runtime_env

    env = package_runtime_env()
    return (ds.map_batches(lambda b: token_counts(b, column), batch_format="pyarrow", runtime_env=env)
              .map_batches(lambda b: quality_scores(b, column), batch_format="pyarrow", runtime_env=env)
              .map_batches(lambda b: detect_language(b, column), batch_format="pyarrow", runtime_env=env)
              .map_batches(lambda b: fingerprint(b, column), batch_format="pyarrow", runtime_env=env))
