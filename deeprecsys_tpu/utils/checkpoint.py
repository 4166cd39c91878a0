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


def _files(path: Path) -> tuple[Path, Path]:
    """Artifact paths for a checkpoint name. Suffixes are APPENDED —
    ``with_suffix`` would collapse dotted names (ckpt.v1 and ckpt.v2 both
    to ckpt.npz), silently loading the wrong weights."""
    name = str(path)
    npz = Path(name if name.endswith(".npz") else name + ".npz")
    return npz, Path(name + ".tree.json")


def save_params(path: str | Path, params) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    host_leaves = [np.asarray(l) for l in leaves]
    npz, sidecar = _files(path)
    np.savez(npz, *host_leaves)
    sidecar.write_text(json.dumps({"treedef": str(treedef),
                                   "num_leaves": len(leaves)}))


def load_params(path: str | Path, like) -> object:
    """Restore into the structure of ``like`` (e.g. a freshly-initialized
    params pytree); shapes and dtypes are validated leaf-by-leaf, and the
    treedef sidecar (when present) must match ``like``'s structure — a
    checkpoint from a DIFFERENT model whose leaf count/shapes coincide
    would otherwise load weights into the wrong slots."""
    path = Path(path)
    npz, sidecar = _files(path)
    if not npz.exists():
        # NO silent fallback to the old with_suffix scheme: that path is
        # ambiguous by construction (ckpt.v1 and ckpt.v2 both collapsed to
        # ckpt.npz), so "fall back" can mean "load a different
        # checkpoint's weights and report success".
        hint = ""
        if path.suffix and path.with_suffix(".npz").exists():
            hint = (f" (a pre-fix save collapsed a dotted name onto "
                    f"{path.with_suffix('.npz')}; identify and re-save it "
                    f"under the current scheme)")
        raise FileNotFoundError(f"no checkpoint at {npz}{hint}")
    with np.load(npz) as data:
        loaded = [data[k] for k in data.files]
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    if sidecar.exists():
        meta = json.loads(sidecar.read_text())
        if meta.get("treedef") not in (None, str(treedef)):
            raise ValueError(
                f"checkpoint tree structure does not match the target "
                f"model:\n  saved:  {meta['treedef']}\n  target: {treedef}")
    if len(loaded) != len(like_leaves):
        raise ValueError(f"checkpoint has {len(loaded)} leaves, expected {len(like_leaves)}")
    out = []
    for got, want in zip(loaded, like_leaves):
        if tuple(got.shape) != tuple(want.shape):
            raise ValueError(f"leaf shape mismatch: {got.shape} vs {want.shape}")
        out.append(got.astype(want.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def load_model_params(model_cfg, path: str | Path):
    """Load a trained checkpoint against ``model_cfg``'s param skeleton
    (shape/dtype template via eval_shape — no throwaway random init).
    Shared by the CLI (--checkpoint) and the cpu-mp engine children, which
    load the path themselves (a params pytree cannot cross the POD rings)."""
    from deeprecsys_tpu.models import get_model

    template = jax.eval_shape(get_model(model_cfg).init, jax.random.PRNGKey(0))
    return load_params(path, template)
