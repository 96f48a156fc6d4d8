"""Checkpoint / resume for estimator state.

The reference has **no** checkpointing — persistence is final artifacts
only (trajectory logs MapGraph.cpp:1814-1848, g2o dumps, PNG/BMP maps);
a crash loses the whole session. Here any pytree of arrays (SLAM
session, particle cloud, UKF state, occupancy grid) round-trips through
a single ``.npz`` file, so long mapping runs resume mid-log.

Format: flattened key paths → arrays, plus a JSON sidecar entry for
static metadata. No framework dependency beyond numpy.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import numpy as np

_META_KEY = "__meta_json__"
_NONE = "__none__"


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)) and not hasattr(tree, "_fields"):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif hasattr(tree, "_fields"):  # NamedTuple
        for k in tree._fields:
            out.update(_flatten(getattr(tree, k), f"{prefix}{k}/"))
    elif tree is None:
        out[prefix.rstrip("/")] = np.asarray(_NONE)
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def save_pytree(path: str, tree: Any, meta: dict | None = None) -> None:
    """Save a pytree of arrays (dicts/lists/NamedTuples/arrays) to
    ``path`` (.npz), with optional JSON-serializable ``meta``."""
    flat = _flatten(jax.tree.map(np.asarray, tree))
    flat[_META_KEY] = np.asarray(json.dumps(meta or {}))
    np.savez_compressed(path, **flat)


def load_pytree(path: str) -> tuple[dict[str, np.ndarray], dict]:
    """Load a checkpoint: returns ``(flat_dict, meta)``. Keys are the
    flattened paths written by :func:`save_pytree` (``a/b/c``)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data[_META_KEY]))
    flat = {}
    for k in data.files:
        if k == _META_KEY:
            continue
        v = data[k]
        flat[k] = None if v.shape == () and str(v) == _NONE else v
    return flat, meta
