"""Pallas TPU kernel: fused multi-table pooled embedding gather-sum.

The TPU-native replacement for the reference's per-table C++
``SparseLengthsSum`` (``dlrm_s_caffe2.py:319-325``). One kernel performs
the pooled lookup for ALL tables of a model:

    table (R, d) in HBM, indices (B, T, L) -> pooled (B, T, d)

Context (measured on v5e, see benchmarks/tpu_work_done.json): XLA's gather
sustains ~64-89 Mrows/s essentially independent of row width — it is
DMA-descriptor-rate limited, not bandwidth limited (128-byte rows sustain
11 GB/s of an 819 GB/s HBM). This kernel explores the explicit-DMA
alternative: a deep ring of in-flight HBM->VMEM copies driven by
scalar-prefetched indices.

Hardware constraint: HBM memrefs are (sublane, 128)-tiled, so a DMA slice
along dim 0 must be sublane-aligned (8 rows f32 / 16 rows bf16 / 32 int8).
Each lookup therefore fetches the ALIGNED block containing its row and a
VPU mask selects the wanted row into the accumulator — this is the minimum
fetch the hardware permits for a random row.

Structure (per pallas_guide.md patterns: PrefetchScalarGridSpec + double
buffering generalized to an S-deep pipeline): grid step g owns BLK output
rows (one output row = one (sample, table) pair = L pooled ids); slot j of
the ring waits, mask-accumulates, and immediately reissues the DMA for the
row S ahead in the stream. Accumulation is f32 in VMEM scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sublane(dtype) -> int:
    return {4: 8, 2: 16, 1: 32}[jnp.dtype(dtype).itemsize]


def _gather_kernel(idx_ref, table_hbm, out_ref, acc_ref, rows_vmem, sems,
                   *, BLK: int, L: int, S: int, ALIGN: int, out_dtype):
    """One grid step: BLK output rows, each pooling L table rows.

    idx_ref:   (num_flat,) int32 in SMEM (scalar-prefetched, full array)
    table_hbm: (R, d) in HBM (pl.ANY), R a multiple of ALIGN
    out_ref:   (BLK, d) VMEM output tile for this grid step
    acc_ref:   (BLK, d) f32 VMEM scratch accumulator
    rows_vmem: (S, ALIGN, d) VMEM ring of aligned landing blocks
    sems:      (S,) DMA semaphores
    """
    g = pl.program_id(0)
    base = g * BLK * L  # first flat id of this block's stream
    total = BLK * L

    def dma(stream_pos, slot):
        row_id = idx_ref[base + stream_pos]
        block = (row_id // ALIGN) * ALIGN
        return pltpu.make_async_copy(
            table_hbm.at[pl.ds(block, ALIGN), :],
            rows_vmem.at[slot],
            sems.at[slot],
        )

    acc_ref[:] = jnp.zeros_like(acc_ref)

    # Prime the pipeline: start the first S DMAs.
    for j in range(S):
        @pl.when(j < total)
        def _():
            dma(j, j).start()

    def body(pos, _):
        slot = jax.lax.rem(pos, S)
        dma(pos, slot).wait()
        row_id = idx_ref[base + pos]
        sub = jax.lax.rem(row_id, ALIGN)
        block = rows_vmem[slot].astype(jnp.float32)          # (ALIGN, d)
        lane = jax.lax.broadcasted_iota(jnp.int32, block.shape, 0)
        picked = jnp.where(lane == sub, block, 0.0).sum(axis=0)  # (d,)
        out_row = pos // L
        acc_ref[out_row, :] += picked
        # Reissue this slot for the row S ahead in the stream.
        @pl.when(pos + S < total)
        def _():
            dma(pos + S, slot).start()
        return 0

    jax.lax.fori_loop(0, total, body, 0)
    out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "block_rows", "pipeline_depth"))
def pallas_embedding_bag(
    table: jax.Array,
    offsets: jax.Array,
    indices: jax.Array,
    *,
    interpret: bool = False,
    block_rows: int = 256,
    pipeline_depth: int = 16,
) -> jax.Array:
    """Drop-in Pallas replacement for ``ops.embedding.embedding_bag``.

    Args:
      table:   (R, d) fused embedding array (HBM-resident).
      offsets: (T,) int32 per-table row offsets.
      indices: (B, T, L) int32 per-table-local ids.

    Returns: (B, T, d) pooled embeddings in the table dtype.
    """
    B, T, L = indices.shape
    R, d = table.shape
    ALIGN = _sublane(table.dtype)
    if R % ALIGN:
        # Pad the fused table to a whole number of aligned blocks so the
        # last row's block fetch stays in bounds.
        table = jnp.concatenate(
            [table, jnp.zeros((ALIGN - R % ALIGN, d), table.dtype)], axis=0
        )
        R = table.shape[0]
    flat = (indices + offsets[None, :, None]).reshape(-1).astype(jnp.int32)

    n_out = B * T
    BLK = min(block_rows, n_out)
    # Pad the output-row count to a multiple of BLK; padded rows re-read
    # row 0 and are dropped (cheap relative to the stream).
    n_blocks = (n_out + BLK - 1) // BLK
    pad_out = n_blocks * BLK - n_out
    if pad_out:
        flat = jnp.concatenate([flat, jnp.zeros((pad_out * L,), jnp.int32)])

    S = min(pipeline_depth, BLK * L)

    kernel = functools.partial(
        _gather_kernel, BLK=BLK, L=L, S=S, ALIGN=ALIGN, out_dtype=table.dtype
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # table stays in HBM
        out_specs=pl.BlockSpec((BLK, d), lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLK, d), jnp.float32),
            pltpu.VMEM((S, ALIGN, d), table.dtype),
            pltpu.SemaphoreType.DMA((S,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLK, d), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(flat, table)
    return out[:n_out].reshape(B, T, d)
