"""Wide & Deep.

Reference: ``models/wide_and_deep.py`` — no bottom MLP (dense features of
width ``mlp_bot[0]`` are concatenated raw with all pooled embeddings,
``create_interactions`` :271-280, ``num_int = num_tables*m + mlp_bot[0]``
:345), then a top MLP ending in Sigmoid (:383).
"""

from __future__ import annotations

import jax

from deeprecsys_tpu.config import ModelConfig
from deeprecsys_tpu.models.base import Batch, compute_dtype_of, param_dtype_of, pooled_lookup, init_tables
from deeprecsys_tpu.ops import mlp_init, mlp_apply, cat_interaction
import jax.numpy as jnp


def init(key: jax.Array, cfg: ModelConfig) -> dict:
    pdt = param_dtype_of(cfg)
    assert len(cfg.mlp_bot) == 1, (
        "WnD takes raw dense features; mlp_bot must be a single width "
        "(reference check wide_and_deep.py:307-313)"
    )
    k_emb, k_top = jax.random.split(key)
    return {
        "tables": init_tables(k_emb, cfg),
        "top": mlp_init(k_top, cfg.ln_top, pdt),
    }


def apply_from_pooled(params: dict, pooled: jax.Array, batch: Batch, cfg: ModelConfig) -> jax.Array:
    cdt = compute_dtype_of(cfg)
    z = cat_interaction(batch.dense.astype(cdt), pooled)
    return mlp_apply(params["top"], z, sigmoid_layer=len(cfg.ln_top) - 1)


def apply(params: dict, batch: Batch, cfg: ModelConfig) -> jax.Array:
    return apply_from_pooled(params, pooled_lookup(params["tables"], batch, cfg), batch, cfg)
