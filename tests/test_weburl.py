"""URL canonicalization (pipelines/weburl.py): pinned adversarial cases,
the dataset-level wrapper + exact-dedup chain, and randomized parity of
the Arrow kernel chain vs its DuckDB SQL mirror."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray

from plugin_serdes_ray.pipelines.weburl import (canonicalize_url_dataset,
                                                canonicalize_urls,
                                                oracle_canonical_sql)

# (input, expected canonical) — each pins one documented step/edge
CASES = [
    # scheme+host lowercase, :443 strip, tracking strip front+middle,
    # fragment drop, in one URL
    ("https://WWW.Example.com:443/path?utm_source=x&a=1&utm_medium=y#f",
     "https://www.example.com/path?a=1"),
    # :80 strip is http-only; empty path roots; query-only rest
    ("http://Host.com:80?fbclid=zz", "http://host.com/"),
    ("https://Host.com:80/p", "https://host.com:80/p"),
    # untouched when clean
    ("https://ok.com/p?a=1&b=2", "https://ok.com/p?a=1&b=2"),
    # bare host
    ("HTTPS://UP.COM", "https://up.com/"),
    # non-default port kept
    ("http://x.com:8080/p", "http://x.com:8080/p"),
    # lone / multiple / leading tracking params
    ("https://x.com/p?utm_a=1", "https://x.com/p"),
    ("https://x.com/p?utm_a=1&utm_b=2", "https://x.com/p"),
    ("https://x.com/p?utm_a=1&b=2", "https://x.com/p?b=2"),
    # a literal '?' inside a value never fakes a query start
    ("https://x.com/p?a=?&utm_b=2", "https://x.com/p?a=?"),
    ("https://x.com/p?utm_a=?&b=2", "https://x.com/p?b=2"),
    # name-boundary: 'refresh' survives a 'ref' rule; ref_src matched whole
    ("https://x.com/p?ref=abc&refresh=1", "https://x.com/p?refresh=1"),
    ("https://x.com/p?ref_src=tw&ref=abc", "https://x.com/p"),
    # non-http(s) schemes: lowercased, port kept
    ("ftp://Mixed.Case:21/f", "ftp://mixed.case:21/f"),
    # pass-through: no scheme
    ("not a url", "not a url"),
    ("//protocol-relative.com/x", "//protocol-relative.com/x"),
    ("", ""),
    # tracking names are case-sensitive (trackers emit lowercase)
    ("https://x.com/p?a=1&REF=up", "https://x.com/p?a=1&REF=up"),
    # only the TRAILING default port is stripped
    ("https://x.com:443:443/p", "https://x.com:443/p"),
    # empty first param then tracking
    ("http://x.com/?&utm_a=1", "http://x.com/"),
    # fragment cuts everything after it
    ("https://x.com/p#frag?utm_a=1", "https://x.com/p"),
    # dangling '?' dropped
    ("https://x.com/p?", "https://x.com/p"),
    # tracking name without '=' is NOT a param match
    ("https://x.com/p?utm_weird", "https://x.com/p?utm_weird"),
]


def test_canonicalize_pinned_cases():
    t = pa.table({"url": pa.array([c[0] for c in CASES] + [None],
                                  type=pa.string())})
    got = canonicalize_urls(t).column("url_canonical").to_pylist()
    assert got == [c[1] for c in CASES] + [None]


def test_canonicalize_in_place_and_custom_out():
    t = pa.table({"url": ["HTTP://A.B/x?utm_c=1"]})
    assert canonicalize_urls(t, out="url").column_names == ["url"]
    assert canonicalize_urls(t, out="url").column("url").to_pylist() == \
        ["http://a.b/x"]
    assert canonicalize_urls(t, out="cu").column_names == ["url", "cu"]


def test_sql_mirror_on_pinned_cases():
    t = pa.table({"url": pa.array([c[0] for c in CASES] + [None],
                                  type=pa.string())})
    con = duckdb.connect()
    con.register("t", t)
    got = [r[0] for r in con.execute(
        f"SELECT {oracle_canonical_sql('url')} FROM t").fetchall()]
    assert got == [c[1] for c in CASES] + [None]


def test_dataset_wrapper_and_dedup_chain(ray_session):
    from plugin_serdes_ray.pipelines.dedup import exact_dedup

    # three spellings of one page + one distinct page
    t = pa.table({
        "doc_id": [3, 1, 2, 4],
        "url": ["https://A.com/p?utm_s=1", "https://a.com:443/p",
                "https://a.com/p#top", "https://b.com/q"]})
    ds = canonicalize_url_dataset(ray.data.from_arrow(t))
    kept = exact_dedup(ds, column="url_canonical", id_column="doc_id")
    rows = sorted((r["doc_id"], r["url_canonical"])
                  for r in kept.take_all())
    assert rows == [(1, "https://a.com/p"), (4, "https://b.com/q")]


def _random_urls(rng: np.random.Generator, n: int) -> list:
    schemes = ["http", "https", "HTTP", "HtTpS", "ftp"]
    hosts = ["x.com", "WWW.Site.ORG", "a.b.c", "h-yphen.net", "xn--idn.de"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/p", "/a/b//c", "/%7Euser", "/p?fake"]
    names = ["a", "b", "utm_source", "utm_X", "fbclid", "ref", "refx",
             "ref_src", "gclid", "REF", "utm_weird"]
    vals = ["", "1", "x?y", "a&", "%20", "??"]
    urls = []
    for _ in range(n):
        kind = rng.integers(0, 10)
        if kind == 0:
            urls.append(rng.choice(["", "no scheme", "//rel.com/x",
                                    "mailto:a@b.c", None]))
            continue
        u = (str(rng.choice(schemes)) + "://" + str(rng.choice(hosts))
             + str(rng.choice(ports)) + str(rng.choice(paths)))
        nq = int(rng.integers(0, 4))
        if nq:
            parts = []
            for _ in range(nq):
                nm = str(rng.choice(names))
                # a bare name (no '=') sometimes
                parts.append(nm if rng.integers(0, 5) == 0
                             else nm + "=" + str(rng.choice(vals)))
            u += "?" + "&".join(parts)
        if rng.integers(0, 3) == 0:
            u += "#frag?utm_source=sneaky&x=1"
        urls.append(u)
    return urls


def test_random_canonicalize_vs_duckdb():
    rng = np.random.default_rng(20260820)
    urls = _random_urls(rng, 600)
    t = pa.table({"url": pa.array(urls, type=pa.string())})
    got = canonicalize_urls(t).column("url_canonical").to_pylist()
    con = duckdb.connect()
    con.register("t", t)
    want = [r[0] for r in con.execute(
        f"SELECT {oracle_canonical_sql('url')} FROM t").fetchall()]
    assert got == want
