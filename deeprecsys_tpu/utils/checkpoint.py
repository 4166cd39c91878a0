"""Parameter checkpointing.

The reference has NO checkpoint/resume (SURVEY.md §5: weights are randomly
re-initialized on every engine start, nothing is ever saved). A production
serving framework needs one, so this is a capability addition: params are
pure pytrees of arrays, saved as an .npz plus a JSON treedef sidecar — no
orbax dependency, no pickle, loadable anywhere.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np


def save_params(path: str | Path, params) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    host_leaves = [np.asarray(l) for l in leaves]
    np.savez(path.with_suffix(".npz"), *host_leaves)
    path.with_suffix(".tree.json").write_text(json.dumps({"treedef": str(treedef),
                                                          "num_leaves": len(leaves)}))


def load_params(path: str | Path, like) -> object:
    """Restore into the structure of ``like`` (e.g. a freshly-initialized
    params pytree); shapes and dtypes are validated leaf-by-leaf."""
    path = Path(path)
    with np.load(path.with_suffix(".npz")) as data:
        loaded = [data[k] for k in data.files]
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    if len(loaded) != len(like_leaves):
        raise ValueError(f"checkpoint has {len(loaded)} leaves, expected {len(like_leaves)}")
    out = []
    for got, want in zip(loaded, like_leaves):
        if tuple(got.shape) != tuple(want.shape):
            raise ValueError(f"leaf shape mismatch: {got.shape} vs {want.shape}")
        out.append(got.astype(want.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)
