"""Model-level parallel composition helpers.

``make_tablewise_model`` lifts any model family onto table-wise-sharded
embeddings: the fused table converts to the (M, rows_per_shard, d)
placement layout, lookups run through ``tablewise_embedding_bag`` (each
chip gathers only its own tables; all-gather combine), and the rest of the
network runs from the pooled embeddings via the models' ``apply_from_pooled``
split — data-parallel over "data", replicated over "model".
"""

from __future__ import annotations

from typing import NamedTuple, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deeprecsys_tpu.config import ModelConfig
from deeprecsys_tpu.models.base import Batch, ModelFns
from deeprecsys_tpu.parallel.placement import TablePlacement, plan_tablewise_placement
from deeprecsys_tpu.parallel.sharding import (
    build_tablewise_tables,
    tablewise_embedding_bag,
)


class TablewiseModel(NamedTuple):
    placement: TablePlacement
    convert_params: Callable  # standard params -> table-wise params
    apply: Callable           # (tw_params, Batch) -> scores (jitted)


def make_tablewise_model(model: ModelFns, mesh: Mesh,
                         placement: TablePlacement | None = None) -> TablewiseModel:
    cfg = model.cfg
    if placement is None:
        placement = plan_tablewise_placement(cfg, mesh.shape["model"])
    quant = cfg.table_quant

    def convert_params(params):
        tables = params["tables"]
        if isinstance(tables, dict) and ("packed" in tables or "q_packed" in tables):
            # One-time conversion: restore the logical (R, d) view (a
            # reshape + tail-pad slice) so placement math stays in logical
            # rows; the tablewise layout re-chunks anyway.
            from deeprecsys_tpu.ops.embedding import unpack_table

            d = cfg.sparse_feature_size
            if "packed" in tables:
                tables = unpack_table(tables["packed"],
                                      tables["packed"].shape[1] // d,
                                      cfg.total_rows)
            else:
                tables = dict(tables, q=unpack_table(
                    tables["q_packed"], tables["q_packed"].shape[1] // d,
                    cfg.total_rows))
        fused = tables["qrows"] if quant == "int8_rowwise" else (
            tables["q"] if quant == "int8" else tables)
        tw = build_tablewise_tables(fused, cfg, placement)
        tw = jax.device_put(tw, NamedSharding(mesh, P("model", None, None)))
        rest = {k: jax.device_put(v, NamedSharding(mesh, P()))
                for k, v in params.items() if k != "tables"}
        if quant == "int8":  # per-table scales replicate
            rest["table_scale"] = jax.device_put(tables["scale"],
                                                 NamedSharding(mesh, P()))
        return dict(rest, tables_tw=tw)

    cdt = jnp.dtype(cfg.compute_dtype)

    def apply(tw_params, batch: Batch):
        rest = {k: v for k, v in tw_params.items()
                if k not in ("tables_tw", "table_scale")}
        if quant == "int8":
            # Pool EXACTLY in int32 per shard, dequantize per original
            # table after the all-gather + inverse permutation.
            pooled_q = tablewise_embedding_bag(
                tw_params["tables_tw"], batch.indices, placement, mesh,
                compute_dtype=jnp.int32, mask=batch.mask)
            pooled = (pooled_q.astype(jnp.float32)
                      * tw_params["table_scale"][None, :, None]).astype(cdt)
        elif quant == "int8_rowwise":
            from deeprecsys_tpu.ops.embedding import dequant_packed_rows

            # Pool in f32 (rows carry individual scales); cast AFTER the
            # bag sum — matching the single-device rowwise path.
            pooled = tablewise_embedding_bag(
                tw_params["tables_tw"], batch.indices, placement, mesh,
                compute_dtype=None, row_transform=dequant_packed_rows,
                mask=batch.mask).astype(cdt)
        else:
            pooled = tablewise_embedding_bag(
                tw_params["tables_tw"], batch.indices, placement, mesh,
                compute_dtype=cdt, mask=batch.mask)
        return model.apply_from_pooled(rest, pooled, batch)

    batch_sh = Batch(
        dense=NamedSharding(mesh, P("data", None)) if cfg.dense_dim else None,
        indices=NamedSharding(mesh, P("data", None, None)),
        # Ragged slot mask shards exactly like the indices it masks; an
        # unmasked batch's None is an empty subtree the sharding
        # broadcasts over (same pattern as parallel.sharding
        # batch_shardings).
        mask=NamedSharding(mesh, P("data", None, None)),
    )
    jitted = jax.jit(
        apply,
        in_shardings=(None, batch_sh),
        out_shardings=NamedSharding(mesh, P("data", None)),
    )
    return TablewiseModel(placement=placement, convert_params=convert_params, apply=jitted)
