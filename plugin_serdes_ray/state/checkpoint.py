"""Per-partition lineage manifest — the engine's checkpoint/resume story.

The reference has no checkpointing (whole-task rerun is its failure
granularity, SURVEY.md §4.1); at 10^12-document scale the unit of retry must
be one partition. Every completed partition publishes an atomic JSON entry
``_manifest/part-NNNNN.json`` carrying its input lineage (file + fingerprint),
codec choices, metrics, and output checksum. Resume = read the manifest,
skip fingerprint-matching completed parts, re-derive identical partitioning
from the (pure-function-of-input) file list.
"""

from __future__ import annotations

import base64
import json
import os
import pickle
from dataclasses import dataclass
from typing import Optional

MANIFEST_DIR = "_manifest"


def _mdir(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR)


def ensure_dirs(out_dir: str) -> None:
    os.makedirs(_mdir(out_dir), exist_ok=True)


def entry_path(out_dir: str, part_id: int) -> str:
    return os.path.join(_mdir(out_dir), f"part-{part_id:05d}.json")


def write_manifest_entry(out_dir: str, part_id: int, entry: dict) -> None:
    path = entry_path(out_dir, part_id)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entry, f, separators=(",", ":"))
    os.replace(tmp, path)


def read_manifest_entries(out_dir: str) -> dict[int, dict]:
    mdir = _mdir(out_dir)
    out: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                entry = json.load(f)
            out[entry["part_id"]] = entry
    return out


def completed_parts(out_dir: str, fingerprints: dict[int, str]) -> set[int]:
    """Part ids whose manifest entry exists, matches the input fingerprint,
    and whose output file is present."""
    done = set()
    for pid, entry in read_manifest_entries(out_dir).items():
        if fingerprints.get(pid) != entry.get("input_fingerprint"):
            continue
        out_file = os.path.join(out_dir, entry["file"])
        if os.path.exists(out_file):
            done.add(pid)
    return done


def prune_stale_parts(out_dir: str, partitions: list[dict]) -> int:
    """Remove part files and manifest entries that are not in the current
    partition plan.

    Re-running ``encode_files`` with a shorter file list or a larger
    ``target_part_bytes`` shrinks the partition count; without pruning, the
    surviving ``part-NNNNN.grck`` files from the previous (longer) plan are
    concatenated by ``decode_table``/``decode_dataset`` as live data and the
    manifest double-counts them. In-plan partitions whose fingerprint changed
    need no removal here: they re-encode to the SAME file name and their
    manifest entry is atomically replaced. Returns the number of stale part
    files removed."""
    live = {f"part-{p['part_id']:05d}.grck" for p in partitions}
    live_json = {f"part-{p['part_id']:05d}.json" for p in partitions}
    removed = 0
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            # EVERY non-live .grck goes, including block-*.grck written by a
            # previous encode_dataset into this dir — decode reads every
            # *.grck, so any survivor is double-counted data
            if name.endswith(".grck") and name not in live:
                os.remove(os.path.join(out_dir, name))
                removed += 1
    mdir = _mdir(out_dir)
    if os.path.isdir(mdir):
        for name in os.listdir(mdir):
            if (name.startswith("part-") and name.endswith(".json")
                    and name not in live_json):
                os.remove(os.path.join(mdir, name))
    return removed


def write_plan(out_dir: str, plan) -> None:
    ensure_dirs(out_dir)
    blob = base64.b64encode(pickle.dumps(plan)).decode()
    path = os.path.join(_mdir(out_dir), "plan.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"plan_pickle": blob, "codecs": getattr(plan, "codecs", {})}, f)
    os.replace(tmp, path)


def read_plan(out_dir: str):
    path = os.path.join(_mdir(out_dir), "plan.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            blob = json.load(f)["plan_pickle"]
        return pickle.loads(base64.b64decode(blob))
    except Exception:
        # stale/incompatible plan (older package layout, truncated write):
        # resume must fall back to re-planning, not crash. Mixed plans
        # across parts are safe — the container format is self-describing
        # per chunk, so parts encoded under the old plan still decode.
        return None


@dataclass
class Manifest:
    out_dir: str

    def summary(self) -> dict:
        entries = read_manifest_entries(self.out_dir)
        rows = sum(e["rows"] for e in entries.values())
        # byte-copied parts from a manifest-less source record raw_bytes
        # as None (unknown, never measured); the ratio covers only parts
        # with a known raw size and the unknown count is surfaced
        known = [e for e in entries.values()
                 if e.get("raw_bytes") is not None]
        raw = sum(e["raw_bytes"] for e in known)
        enc = sum(e["enc_bytes"] for e in entries.values())
        enc_known = sum(e["enc_bytes"] for e in known)
        out = {
            "parts": len(entries), "rows": rows,
            "raw_bytes": raw, "enc_bytes": enc,
            "ratio": (raw / enc_known) if enc_known else 0.0,
        }
        unknown = len(entries) - len(known)
        if unknown:
            out["raw_unknown_parts"] = unknown
        return out
