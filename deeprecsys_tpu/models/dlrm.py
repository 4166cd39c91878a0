"""DLRM (covers RMC1/RMC2/RMC3 via configs).

Reference: ``models/dlrm_s_caffe2.py`` — bottom MLP over dense features,
per-table SparseLengthsSum pooled lookups, dot/cat feature interaction
(``create_interactions``, :331-363), top MLP ending in Sigmoid
(``sigmoid_top = ln_top.size - 1``, :473).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprecsys_tpu.config import ModelConfig
from deeprecsys_tpu.models.base import Batch, compute_dtype_of, param_dtype_of, pooled_lookup, init_tables
from deeprecsys_tpu.ops import mlp_init, mlp_apply, dot_interaction, cat_interaction


def init(key: jax.Array, cfg: ModelConfig) -> dict:
    pdt = param_dtype_of(cfg)
    k_emb, k_bot, k_top = jax.random.split(key, 3)
    ln_bot = cfg.mlp_bot
    assert ln_bot[-1] == cfg.sparse_feature_size, (
        f"bottom-MLP out dim {ln_bot[-1]} must equal sparse feature size "
        f"{cfg.sparse_feature_size} (reference check dlrm_s_caffe2.py:436-438)"
    )
    return {
        "tables": init_tables(k_emb, cfg),
        "bot": mlp_init(k_bot, ln_bot, pdt),
        "top": mlp_init(k_top, cfg.ln_top, pdt),
    }


def apply_from_pooled(params: dict, pooled: jax.Array, batch: Batch, cfg: ModelConfig) -> jax.Array:
    """Forward from pooled embeddings (B, T, d); the split point for
    sparse-gradient training (see train.py)."""
    cdt = compute_dtype_of(cfg)
    x = batch.dense.astype(cdt)
    dense_out = mlp_apply(params["bot"], x)  # all-ReLU (sigmoid_bot = -1)
    if cfg.interaction_op == "dot":
        z = dot_interaction(dense_out, pooled, self_interaction=cfg.interaction_itself)
    else:
        z = cat_interaction(dense_out, pooled)
    # Sigmoid on the final top layer (reference sigmoid_top).
    return mlp_apply(params["top"], z, sigmoid_layer=len(cfg.ln_top) - 1)


def apply(params: dict, batch: Batch, cfg: ModelConfig) -> jax.Array:
    return apply_from_pooled(params, pooled_lookup(params["tables"], batch, cfg), batch, cfg)
