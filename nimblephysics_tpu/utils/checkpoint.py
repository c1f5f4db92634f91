"""Checkpoint/resume for long-running solves (SURVEY §5.4).

The reference's long-horizon workflows (trajectory optimization, MPC
serving, biomech fitting) resume from serialized state — plan buffers,
`Solution::reoptimize` warm starts, fitter intermediates. Here everything
that matters is a pytree of arrays + hashable static metadata, so one
checkpointer covers all of them:

  * solver state (iLQR warm controls, AL multipliers, Adam moments)
  * simulation state (State pytrees, LCP warm-start impulses)
  * model parameters (after sysid / domain randomization)
  * RNG keys

Format: a single .npz with a JSON manifest describing the tree structure —
no framework lock-in, diffable manifests, loadable from plain numpy.
Orbax is the production alternative for sharded multi-host state; this is
the dependency-free path (orbax stays optional for single-host tooling).
"""

from __future__ import annotations

import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree: Any):
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = ["/".join(str(k) for k in path) for path, _ in leaves_with_paths]
    leaves = [leaf for _, leaf in leaves_with_paths]
    return paths, leaves, treedef


def save_checkpoint(path: str, tree: Any, meta: dict | None = None) -> None:
    """Serialize a pytree of arrays to `<path>` (.npz).

    `meta` is an optional JSON-serializable dict stored alongside (step
    counters, wall-clock, config hashes)."""
    paths, leaves, _ = _flatten_with_paths(tree)
    arrays = {}
    manifest = {"paths": paths, "dtypes": [], "meta": meta or {}}
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        arrays[f"leaf_{i}"] = a
        manifest["dtypes"].append(str(a.dtype))
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    )
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_checkpoint(path: str, like: Any = None):
    """Load a checkpoint. With `like` (a pytree of the same structure),
    leaves are restored INTO that structure (and cast to its leaf dtypes),
    so NamedTuples/dataclasses round-trip. Without `like`, returns
    (flat list of arrays, manifest dict)."""
    with np.load(path) as data:
        manifest = json.loads(bytes(data["__manifest__"]).decode())
        leaves = [data[f"leaf_{i}"] for i in range(len(manifest["paths"]))]
    if like is None:
        return leaves, manifest
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    if len(like_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, target structure has "
            f"{len(like_leaves)} — saved paths: {manifest['paths'][:8]}..."
        )
    like_paths, _, _ = _flatten_with_paths(like)
    if like_paths != manifest["paths"]:
        bad = [
            (s, t) for s, t in zip(manifest["paths"], like_paths) if s != t
        ]
        raise ValueError(
            "checkpoint pytree paths do not match the target structure "
            f"(same leaf count, different fields) — first mismatches: "
            f"{bad[:4]}. Pass a `like` tree with the structure the "
            "checkpoint was saved from."
        )
    restored = [
        jnp.asarray(a, dtype=jnp.asarray(l).dtype)
        for a, l in zip(leaves, like_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, restored)


def checkpoint_meta(path: str) -> dict:
    """Read just the manifest (cheap introspection)."""
    with np.load(path) as data:
        return json.loads(bytes(data["__manifest__"]).decode())
