"""Neural Collaborative Filtering.

Reference: ``models/ncf.py`` — exactly 4 embedding tables, 1 index per
lookup (:348-356): tables 0-1 feed the MF branch, tables 2-3 the MLP branch.
MF branch: elementwise Sum of the two MF vectors (``create_mf_interaction``
:301-305 — a Sum, not a product, despite the name). MLP branch: Concat
(:308-314) then an all-ReLU MLP over ``ln_top[:-1]`` (:330-332) where
``ln_top = [2*m] + mlp_top`` (:384-388). Branches are concatenated and fed a
final FC ``[m + ln_top[-2]] -> ln_top[-1]`` with ReLU (:334-343 — NCF's
create_mlp has no sigmoid path). No dense-feature input (run_queues ignores
fc, :107-115).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprecsys_tpu.config import ModelConfig
from deeprecsys_tpu.models.base import Batch, compute_dtype_of, param_dtype_of, pooled_lookup, init_tables
from deeprecsys_tpu.ops import mlp_init, mlp_apply


def init(key: jax.Array, cfg: ModelConfig) -> dict:
    pdt = param_dtype_of(cfg)
    m = cfg.sparse_feature_size
    ln_top = cfg.ln_top  # (2m,) + mlp_top
    k_emb, k_mlp, k_final = jax.random.split(key, 3)
    return {
        "tables": init_tables(k_emb, cfg),
        "mlp": mlp_init(k_mlp, ln_top[:-1], pdt),
        "final": mlp_init(k_final, (m + ln_top[-2], ln_top[-1]), pdt),
    }


def apply_from_pooled(params: dict, emb: jax.Array, batch: Batch, cfg: ModelConfig) -> jax.Array:
    zmf = emb[:, 0, :] + emb[:, 1, :]
    zmlp = jnp.concatenate([emb[:, 2, :], emb[:, 3, :]], axis=1)
    mlp_out = mlp_apply(params["mlp"], zmlp)
    r = jnp.concatenate([zmf, mlp_out], axis=1)
    # Reference head = FC+ReLU; "logits" exposes the pre-activation for
    # training/ranking (config.py output_head).
    return mlp_apply(params["final"], r,
                     final_relu=cfg.output_head != "logits")


def apply(params: dict, batch: Batch, cfg: ModelConfig) -> jax.Array:
    return apply_from_pooled(params, pooled_lookup(params["tables"], batch, cfg), batch, cfg)
