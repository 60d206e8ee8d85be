"""Checkpoint / resume for pipeline state.

The reference has no checkpointing (its only persistent state is a
1-frame cache, SURVEY.md §5); the VO/BA backend added in this build
carries real state — tracklet table, window poses, trajectory, pose
graph — which snapshots as an explicit pytree.  Format: a single .npz
(atomic rename) holding flattened leaves + a structure descriptor; no
external checkpoint libraries required.

Leaves are stored with their `tree_flatten_with_path` key-paths, and
restore matches by PATH, not position — a state field inserted in the
middle of a NamedTuple cannot silently shift later leaves onto
coincidentally shape-compatible values (the failure mode of purely
positional migration).  Pre-keypath checkpoints (no `__keypaths__`
entry) fall back to the positional protocol.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

import numpy as np
import jax


def _keypath_str(kp) -> str:
    return jax.tree_util.keystr(kp)


def save_checkpoint(path: str, state: Any, metadata: dict | None = None
                    ) -> None:
    """Snapshot an arbitrary pytree of arrays to `path` (atomically)."""
    kp_leaves, treedef = jax.tree_util.tree_flatten_with_path(state)
    arrays = {f"leaf_{i}": np.asarray(leaf)
              for i, (_, leaf) in enumerate(kp_leaves)}
    paths = [_keypath_str(kp) for kp, _ in kp_leaves]
    arrays["__keypaths__"] = np.frombuffer(
        json.dumps(paths).encode(), dtype=np.uint8)
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
    gained `motion_ok`), which changes the leaf set between the
    checkpoint and `like`.  With key-path records (every checkpoint
    written by this module's current format) leaves are matched BY
    PATH: fields added anywhere default from `like` when
    `allow_missing_trailing=True` (fail-loud otherwise), removed
    fields' stored leaves are ignored, and an inserted field can never
    mis-assign a later leaf.  For pre-keypath checkpoints the old
    positional protocol applies (missing TRAILING leaves defaulted).

    Returns (state, metadata).
    """
    z = np.load(path)
    kp_like, treedef = jax.tree_util.tree_flatten_with_path(like)
    n = len(kp_like)

    def check(i_like: int, arr: np.ndarray, label: str) -> np.ndarray:
        ref = np.asarray(kp_like[i_like][1])
        if arr.shape != ref.shape:
            raise ValueError(
                f"leaf {label}: shape {arr.shape} != expected {ref.shape}")
        return arr.astype(ref.dtype)

    meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z else {}

    if "__keypaths__" in z:
        stored_paths = json.loads(bytes(z["__keypaths__"]).decode())
        by_path = {p: i for i, p in enumerate(stored_paths)}
        leaves = []
        for i, (kp, leaf) in enumerate(kp_like):
            p = _keypath_str(kp)
            if p in by_path:
                leaves.append(check(i, z[f"leaf_{by_path[p]}"], p))
            elif allow_missing_trailing:
                leaves.append(np.asarray(leaf))
            else:
                raise ValueError(
                    f"checkpoint is missing leaf {p!r} "
                    f"(stored: {len(stored_paths)} leaves, expected {n}; "
                    "pass allow_missing_trailing=True to default new "
                    "fields from `like`)")
        return jax.tree_util.tree_unflatten(treedef, leaves), meta

    # pre-keypath format: positional with trailing-default migration
    leaves = []
    for i in range(n):
        key = f"leaf_{i}"
        if key not in z:
            if allow_missing_trailing:
                leaves.extend(np.asarray(l) for _, l in kp_like[i:])
                break
            raise ValueError(
                f"checkpoint has "
                f"{len([k for k in z.files if k.startswith('leaf_')])} "
                f"leaves, expected {n}")
        leaves.append(check(i, z[key], str(i)))
    return jax.tree_util.tree_unflatten(treedef, leaves), meta
