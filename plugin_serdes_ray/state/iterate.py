"""Resumable driver loops for iterative algorithms (k-means, logistic
regression, PageRank, ...): at 100 TB ONE iteration costs a full corpus
pass, so after a driver crash the unit of retry must be the iteration,
not the whole job. ``checkpointed_loop`` persists the (small, driver-side)
state after every iteration — atomic tmp+rename ``.npz`` files keyed by
iteration number plus a params fingerprint guard, the same publish
discipline as ``state/checkpoint.py``'s partition manifest — and a rerun
continues from the latest complete checkpoint instead of iteration 0.

The reference (kestra-io/plugin-serdes) has no iterative jobs at all;
this is engine infrastructure for the ML loops in ``pipelines/vectors.py``.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Callable, Optional

import numpy as np

_META = "loop-meta.json"


def _state_path(checkpoint_dir: str, it: int) -> str:
    return os.path.join(checkpoint_dir, f"iter-{it:05d}.npz")


def save_state(checkpoint_dir: str, it: int, state: dict) -> None:
    """Atomically persist one iteration's state: numpy arrays go into the
    npz payload, everything JSON-serializable rides a ``__meta`` entry.
    A crash mid-write leaves only a ``.tmp`` file, which resume ignores."""
    arrays = {k: v for k, v in state.items() if isinstance(v, np.ndarray)}
    plain = {k: v for k, v in state.items()
             if not isinstance(v, np.ndarray)}
    path = _state_path(checkpoint_dir, it)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, __meta=np.frombuffer(
            json.dumps(plain).encode(), dtype=np.uint8), **arrays)
    os.replace(tmp, path)


def load_state(path: str) -> dict:
    with np.load(path) as z:
        state = {k: z[k] for k in z.files if k != "__meta"}
        state.update(json.loads(bytes(z["__meta"]).decode()))
    return state


def load_latest(checkpoint_dir: str):
    """-> ``(iteration, state)`` of the newest COMPLETE checkpoint, or
    ``(0, None)`` when none exists. ``.tmp`` leftovers are ignored."""
    done = sorted(glob.glob(os.path.join(checkpoint_dir, "iter-*.npz")))
    if not done:
        return 0, None
    path = done[-1]
    it = int(os.path.basename(path)[5:10])
    return it, load_state(path)


def checkpointed_loop(step: Callable, init_state: dict, iters: int,
                      checkpoint_dir: Optional[str] = None, *,
                      fingerprint: str = "") -> tuple[dict, int]:
    """Run ``state, stop = step(state, it)`` for ``it = 1..iters`` (or
    until ``stop``), checkpointing after every iteration when
    ``checkpoint_dir`` is given. A rerun resumes AFTER the latest complete
    iteration; completed iterations are never re-executed. ``fingerprint``
    (input corpus + parameters) guards staleness: a mismatch clears the
    old checkpoints instead of silently resuming a different job's state
    (the same r3 #3 contract as the text/IVF/minhash indexes).

    ``state`` must be a flat dict of numpy arrays and JSON-serializable
    scalars/lists — driver-side model state (centroids, weights, loss
    curves), never data. Returns ``(final_state, iterations_run)``
    where ``iterations_run`` counts only the iterations executed by THIS
    call."""
    start, state = 0, dict(init_state)
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        meta_path = os.path.join(checkpoint_dir, _META)
        if os.path.exists(meta_path):
            old = json.load(open(meta_path))
            if old.get("fingerprint") != fingerprint:
                for f in glob.glob(os.path.join(checkpoint_dir,
                                                "iter-*.npz*")):
                    os.remove(f)
                os.remove(meta_path)
        if not os.path.exists(meta_path):
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"fingerprint": fingerprint}, f)
            os.replace(tmp, meta_path)
        start, loaded = load_latest(checkpoint_dir)
        if loaded is not None:
            state = loaded
            if bool(state.pop("__stopped", False)):
                return state, 0
    ran = 0
    for it in range(start + 1, int(iters) + 1):
        state, stop = step(state, it)
        ran += 1
        if checkpoint_dir:
            save_state(checkpoint_dir, it,
                       {**state, "__stopped": bool(stop)})
        if stop:
            break
    return state, ran
