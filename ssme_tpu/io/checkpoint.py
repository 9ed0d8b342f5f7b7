"""Checkpoint / resume for long-running inference.

The reference has no checkpoint system (SURVEY §5.4) — only CSV streams
that happen to be resumable by hand.  Here any pytree of arrays (e.g.
``PMMHState``: position, moments, Ct, accept stats, PRNG keys — or a
filter's particle cloud) round-trips through a single ``.npz`` file, so a
killed run resumes exactly where it stopped via
``AdaptivePMMH.run_from(state, ...)``.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Tuple

import jax
import numpy as np


def save_checkpoint(path: str, state: Any, metadata: dict = None) -> None:
    """Atomically save a pytree of arrays + JSON-able metadata."""
    leaves, treedef = jax.tree_util.tree_flatten(state)

    def to_np(leaf):
        if hasattr(leaf, "dtype") and jax.dtypes.issubdtype(
                getattr(leaf, "dtype", None), jax.dtypes.prng_key):
            return np.asarray(jax.random.key_data(leaf))
        return np.asarray(leaf)

    payload = {f"leaf_{i}": to_np(leaf) for i, leaf in enumerate(leaves)}
    payload["__meta__"] = np.frombuffer(
        json.dumps({"num_leaves": len(leaves),
                    "metadata": metadata or {}}).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def load_checkpoint(path: str, like: Any) -> Tuple[Any, dict]:
    """Load a checkpoint into the structure of the ``like`` pytree.

    Returns (state, metadata).  ``like`` supplies the pytree structure
    (e.g. a freshly-built ``PMMHState``); leaf values are replaced.
    """
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        leaves = [data[f"leaf_{i}"] for i in range(meta["num_leaves"])]
    treedef = jax.tree_util.tree_structure(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves; template has "
            f"{treedef.num_leaves}")
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    # restore PRNG key dtype where the template uses typed keys
    def fix(tmpl, leaf):
        if hasattr(tmpl, "dtype") and jax.dtypes.issubdtype(
                getattr(tmpl, "dtype", None), jax.dtypes.prng_key):
            return jax.random.wrap_key_data(np.asarray(leaf, dtype=np.uint32))
        return leaf
    state = jax.tree_util.tree_map(fix, like, state)
    return state, meta["metadata"]


__all__ = ["save_checkpoint", "load_checkpoint"]
