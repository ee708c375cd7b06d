#!/usr/bin/env python
"""Headline benchmark: streaming re-encode of the Common-Crawl-style webpages
corpus (north rule) — encode throughput, compression ratio vs the reference's
Parquet-GZIP defaults, decode throughput, and N-vs-4N scaling evidence.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...extras}

--scaling runs the same job in two fresh processes (num_cpus=8 and 32) on the
same input with a fixed partition count and reports throughput at both plus
scaling efficiency (the in-sandbox stand-in for N vs 4N node clusters).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time


def _corpus(sf_dir: str) -> list[str]:
    from plugin_serdes_ray.fixtures import webpages_for_sf

    return webpages_for_sf(sf_dir)


def _parquet_gzip_baseline(files: list[str]) -> dict:
    """Reference-equivalent output: pyarrow Parquet at the reference defaults
    (GZIP, dictionary on — /root/reference parquet/IonToParquet.java:115,187).
    Cached next to the corpus; timing is single-threaded like the reference."""
    import pyarrow.parquet as pq

    from plugin_serdes_ray.util import files_fingerprint

    cache = os.path.join(os.path.dirname(files[0]), "_parquet_gzip_baseline.json")
    # canonical (name, size, mtime_ns) staleness stamp — a regenerated
    # same-size corpus must NOT reuse the old baseline (the previous
    # count+total-size key silently would)
    fp = files_fingerprint(files)
    if os.path.exists(cache):
        with open(cache) as f:
            data = json.load(f)
        if data.get("fingerprint") == fp:
            return data
    total_bytes = 0
    raw_bytes = 0
    t0 = time.perf_counter()
    tmp = "/dev/shm/graft_gzbase.tmp"  # same output tier as the engine
    for f in files:
        # single-threaded like the reference; also the threaded arrow read
        # path is pathologically slow on this VM (30x, measured r3), and the
        # baseline should not be CHARGED for that — keep it honest
        t = pq.read_table(f, use_threads=False)
        raw_bytes += t.nbytes
        pq.write_table(t, tmp, compression="gzip", use_dictionary=True,
                       data_page_size=1 << 20)
        total_bytes += os.path.getsize(tmp)
        os.remove(tmp)
    secs = time.perf_counter() - t0
    data = {"fingerprint": fp, "bytes": total_bytes, "secs": secs,
            "raw_bytes": raw_bytes}
    with open(cache, "w") as f:
        json.dump(data, f)
    return data


def run_bench(sf_dir: str, num_cpus: int, outer_level: int = 3, repeat: int = 1,
              reps: int = 1) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from plugin_serdes_ray.encode import (
        decode_dataset, encode_files, sample_plan_from_files,
    )
    from plugin_serdes_ray.util import warm_cluster

    files = _corpus(sf_dir)
    if repeat > 1:
        files = [f for f in files for _ in range(repeat)]
    warm_cluster(num_cpus)  # cluster-startup analog, excluded from timings
    input_bytes = sum(os.path.getsize(f) for f in files)
    # warm the page cache over the input corpus: the sandbox's virtual disk
    # reads at ~35 MB/s wall-wide, so a cold first pass measures THAT disk,
    # not the engine (a real cluster reads from per-node object storage /
    # page-cache-resident shards). One sequential pass, excluded from timing.
    for f in set(files):
        with open(f, "rb") as fh:
            while fh.read(64 << 20):
                pass
    # output tier = shared-memory fs: the sandbox's virtual disk writes at
    # ~35 MB/s wall-wide and would serialize any multi-writer benchmark; a
    # real cluster lands partitions on per-node object storage instead
    out_dir = f"/dev/shm/graft_bench_out_{os.getpid()}"
    shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.perf_counter()
    plan = sample_plan_from_files(files, sample_rows=8_192, outer_level=outer_level)
    t_plan = time.perf_counter() - t0

    # reps>1: re-run the encode and take the median wall (the sandbox VM's
    # shared-tenant noise swings single runs 2-3x; see BASELINE.md)
    encode_times = []
    for rep in range(max(reps, 1)):
        rep_dir = out_dir if rep == 0 else f"{out_dir}_r{rep}"
        t0 = time.perf_counter()
        summary = encode_files(files, rep_dir, plan=plan, resume=False,
                               concurrency=num_cpus)
        encode_times.append(time.perf_counter() - t0)
        if rep > 0:
            shutil.rmtree(rep_dir, ignore_errors=True)
    # best-of-N approximates the un-contended machine (shared-tenant VM);
    # both cluster sizes get identical treatment
    t_encode = min(encode_times)

    # best-of-3 decode, same treatment as encode (shared-tenant walls swing
    # 2-3x between identical runs; min approximates the un-contended box)
    decode_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        ds = decode_dataset(out_dir, concurrency=num_cpus)
        n_rows = ds.count()
        decode_times.append(time.perf_counter() - t0)
    t_decode = min(decode_times)

    # selective point query (url ==): manifest Bloom/zone pruning + the
    # late-materialized predicate decode — the "find one page in the
    # container" read path, best-of-3 like the scans above
    import pyarrow.parquet as pq

    probe_url = pq.read_table(files[0], columns=["url"]).column("url")[7].as_py()
    point_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        hits = decode_dataset(out_dir, columns=["url", "lang"],
                              predicate=("url", "==", probe_url)).count()
        point_times.append(time.perf_counter() - t0)
    t_point = min(point_times)
    assert hits >= 1

    # baseline over the UNIQUE corpus, scaled by repeat once: passing the
    # already-repeated list would both re-gzip duplicates (wasted minutes)
    # and double-count repeat in the ratio below (enc is repeat x E while
    # bytes would be repeat x B, so dividing by bytes*repeat overstated the
    # size win by exactly repeat); deduping also keeps ONE cache fingerprint
    # across plain and --repeat runs instead of clobbering alternately
    baseline = _parquet_gzip_baseline(sorted(set(files)))
    raw = summary["raw_bytes"]
    enc = summary["enc_bytes"]
    result = {
        "sf_dir": sf_dir,
        "num_cpus": num_cpus,
        "rows": n_rows,
        "parts": summary["parts"],
        "input_parquet_bytes": input_bytes,
        "raw_arrow_bytes": raw,
        "encoded_bytes": enc,
        "compression_ratio": raw / enc if enc else 0.0,
        "parquet_gzip_bytes": baseline["bytes"] * repeat,
        "parquet_gzip_secs": baseline["secs"] * repeat,
        "size_vs_parquet_gzip": enc / (baseline["bytes"] * repeat) if baseline["bytes"] else 0.0,
        "outer_level": outer_level,
        "plan_secs": t_plan,
        "encode_secs": t_encode,
        "encode_secs_all": encode_times,
        "decode_secs": t_decode,
        "encode_gbps": raw / t_encode / 1e9,
        "decode_gbps": raw / t_decode / 1e9,
        "point_query_secs": t_point,
        "point_query_hits": hits,
        "plan": summary["plan"],
    }
    shutil.rmtree(out_dir, ignore_errors=True)
    return result


def run_scaling(sf_dir: str, cpus_lo: int = 2, cpus_hi: int = 8,
                outer_level: int = 3, repeat: int = 3) -> dict:
    """Two fresh processes, identical input + partition count (the
    in-sandbox stand-in for N- vs 4N-node clusters).

    Defaults to 2 vs 8 CPUs: measured pure-ALU scaling on this sandbox VM
    saturates at ~16 effective cores (32 advertised), so 8-vs-32 measures
    the shared box, not the job; 2-vs-8 is the largest 4x step the hardware
    can express. The corpus is repeated 3x (fixed 192-part ordering, same at
    both sizes) so walls are long enough to average scheduler noise."""
    _corpus(sf_dir)  # pre-generate so neither child pays generation cost
    results = {}
    for cpus in (cpus_lo, cpus_hi):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--sf-dir", sf_dir,
             "--cpus", str(cpus), "--outer-level", str(outer_level),
             "--repeat", str(repeat), "--reps", "3", "--child"],
            capture_output=True, text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if out.returncode != 0 or not out.stdout.strip():
            raise RuntimeError(
                f"scaling child (cpus={cpus}) failed rc={out.returncode}; "
                f"stderr tail:\n{out.stderr[-2000:]}")
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    lo, hi = results[cpus_lo], results[cpus_hi]
    thr_lo = lo["extras"]["encode_gbps"]
    thr_hi = hi["extras"]["encode_gbps"]
    eff = (thr_hi / thr_lo) / (cpus_hi / cpus_lo) if thr_lo else 0.0
    return {
        "cpus_lo": cpus_lo, "cpus_hi": cpus_hi,
        "encode_gbps_lo": thr_lo, "encode_gbps_hi": thr_hi,
        "encode_secs_lo": lo["extras"]["encode_secs"],
        "encode_secs_hi": hi["extras"]["encode_secs"],
        "scaling_efficiency": eff,
        "parts": lo["extras"]["parts"],
    }


def memcpy_gbps(size_mb: int = 256, reps: int = 3) -> float:
    """Host-weather probe: single-process memory-copy bandwidth (GB/s).
    Recorded into every bench artifact so a regression in a future BENCH
    file is attributable to host degradation vs code on the spot (round 3
    cost a full re-measurement session to adjudicate exactly this)."""
    import numpy as np

    src = np.ones(size_mb * (1 << 20), dtype=np.uint8)
    dst = np.empty_like(src)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        np.copyto(dst, src)
        dt = time.perf_counter() - t0
        best = max(best, src.nbytes / dt / 1e9)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--outer-level", type=int, default=3)
    # None = mode default (1 plain, 3 scaling children) so --scaling keeps
    # its long-walls methodology unless the user explicitly overrides
    ap.add_argument("--repeat", type=int, default=None)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    sf = os.path.basename(os.path.normpath(args.sf_dir)).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    if args.scaling:
        scaling = run_scaling(args.sf_dir, outer_level=args.outer_level,
                              repeat=3 if args.repeat is None else args.repeat)
        scaling["memcpy_gbps"] = memcpy_gbps()
        line = {
            "metric": "webpages re-encode N-vs-4N scaling",
            "value": scaling["scaling_efficiency"],
            "unit": "efficiency",
            "queries": {
                f"encode_cpus{scaling['cpus_lo']}": scaling["encode_secs_lo"],
                f"encode_cpus{scaling['cpus_hi']}": scaling["encode_secs_hi"],
            },
            "sf": sf_val,
            "num_cpus": scaling["cpus_hi"],
            "extras": scaling,
        }
        print(json.dumps(line))
        return

    import ray

    res = run_bench(args.sf_dir, args.cpus, outer_level=args.outer_level,
                    repeat=1 if args.repeat is None else args.repeat,
                    reps=args.reps if args.child else max(args.reps, 3))
    total = res["plan_secs"] + res["encode_secs"] + res["decode_secs"]
    line = {
        "metric": "webpages corpus re-encode (plan+encode+decode) wall sec",
        "value": total,
        "unit": "sec",
        "queries": {
            "plan": res["plan_secs"],
            "encode_webpages": res["encode_secs"],
            "decode_webpages": res["decode_secs"],
        },
        "sf": sf_val,
        "num_cpus": res["num_cpus"],
        "extras": {k: v for k, v in res.items() if k not in ("plan",)},
    }
    line["extras"]["memcpy_gbps"] = memcpy_gbps()
    print(json.dumps(line))
    ray.shutdown()


if __name__ == "__main__":
    main()
