"""Data-scale linearity harness (VERDICT r4 #7): run named registry
queries at several sf dirs, each in a FRESH 32-cpu Ray process, and
report wall-clock growth per 10x data step. Super-linear growth flags a
hidden all-to-all or driver materialization.

Usage:
  python tools/linearity.py --sf-dirs /root/testdata/sf0.01 \
      /root/testdata/sf0.1 /tmp/graft_sf1 -- \
      dedup_clusters_documents tfidf_top_terms_documents
(child mode is internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(name: str, sf_dir: str, cpus: int) -> int:
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    sys.path.insert(0, REPO)
    import __ray_entry__ as entry

    q = entry.queries()[name]
    t0 = time.perf_counter()
    res = q(sf_dir)
    rows = res.num_rows if hasattr(res, "num_rows") else (
        res.count() if hasattr(res, "count") else len(res))
    wall = time.perf_counter() - t0
    print(json.dumps({"query": name, "sf_dir": sf_dir, "wall": wall,
                      "rows": int(rows)}))
    ray.shutdown()
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dirs", nargs="+", required=True)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--child", nargs=2, metavar=("QUERY", "SF_DIR"),
                    help=argparse.SUPPRESS)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    if args.child:
        return child(args.child[0], args.child[1], args.cpus)
    out: dict = {}
    for name in args.queries:
        walls = []
        for sf in args.sf_dirs:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--sf-dirs", "x", "--cpus", str(args.cpus),
                 "--child", name, sf],
                capture_output=True, text=True, cwd=REPO)
            if r.returncode != 0:
                print(f"{name} @ {sf}: FAILED\n{r.stderr[-1500:]}",
                      file=sys.stderr)
                walls.append(None)
                continue
            rec = json.loads(r.stdout.strip().splitlines()[-1])
            walls.append(rec["wall"])
            print(f"{name} @ {os.path.basename(sf)}: "
                  f"{rec['wall']:.1f}s rows={rec['rows']}", flush=True)
        growth = [round(b / a, 2) if a and b else None
                  for a, b in zip(walls, walls[1:])]
        out[name] = {"walls": [round(w, 2) if w else None for w in walls],
                     "growth": growth}
    print(json.dumps({"sf_dirs": args.sf_dirs, "results": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
