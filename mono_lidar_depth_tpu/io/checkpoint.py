"""Checkpoint / resume for pipeline state.

The reference has no checkpointing (its only persistent state is a
1-frame cache, SURVEY.md §5); the VO/BA backend added in this build
carries real state — tracklet table, window poses, trajectory, pose
graph — which snapshots as an explicit pytree.  Format: a single .npz
(atomic rename) holding flattened leaves + a structure descriptor; no
external checkpoint libraries required.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

import numpy as np
import jax


def save_checkpoint(path: str, state: Any, metadata: dict | None = None
                    ) -> None:
    """Snapshot an arbitrary pytree of arrays to `path` (atomically)."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(metadata or {}).encode(), dtype=np.uint8)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str, like: Any,
                    allow_missing_trailing: bool = False) -> tuple[Any, dict]:
    """Restore a pytree saved by save_checkpoint.

    `like` provides the tree structure (e.g. a freshly-created state of
    the same shape); leaf VALUES come from the file.  Shapes and dtypes
    are validated leaf-by-leaf.

    State NamedTuples occasionally grow fields (e.g. OdometryState
    gained `motion_ok`), which changes the leaf count and makes older
    checkpoints fail the count check below (fail-loud by default).
    `allow_missing_trailing=True` is the migration path for such
    checkpoints: missing TRAILING leaves are defaulted from `like`
    (correct when fields were appended; anything else still errors on
    the per-leaf shape check).

    Returns (state, metadata).
    """
    z = np.load(path)
    leaves_like, treedef = jax.tree.flatten(like)
    n = len(leaves_like)
    leaves = []
    for i in range(n):
        key = f"leaf_{i}"
        if key not in z:
            if allow_missing_trailing:
                leaves.extend(np.asarray(l) for l in leaves_like[i:])
                break
            raise ValueError(
                f"checkpoint has {len([k for k in z.files if k.startswith('leaf_')])} "
                f"leaves, expected {n}")
        arr = z[key]
        ref = np.asarray(leaves_like[i])
        if arr.shape != ref.shape:
            raise ValueError(
                f"leaf {i}: shape {arr.shape} != expected {ref.shape}")
        leaves.append(arr.astype(ref.dtype))
    meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z else {}
    return jax.tree.unflatten(treedef, leaves), meta
