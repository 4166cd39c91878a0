"""Pallas TPU kernel: fused multi-table pooled embedding gather-sum.

The TPU-native replacement for the reference's per-table C++
``SparseLengthsSum`` (``dlrm_s_caffe2.py:319-325``). One kernel performs
the pooled lookup for ALL tables of a model:

    table (R, d) in HBM, indices (B, T, L) -> pooled (B, T, d)

Why a hand-written kernel: XLA's TPU gather lowering fetches rows through
a serialized dynamic-slice path; measured on v5e it sustains only
~80-90 Mrows/s (~11 GB/s of 128-byte rows against an 819 GB/s HBM).
This kernel drives the row fetches as explicit HBM->VMEM DMAs with a deep
ring of in-flight copies, then reduces the pooling axis on the VPU.

Structure (per pallas_guide.md patterns: PrefetchScalarGridSpec + double
buffering, generalized to an S-deep pipeline):

  grid step g handles a block of BLK output rows (one output row = one
  (sample, table) pair, i.e. L pooled ids):
    - the flat index array arrives via scalar prefetch (SMEM), so the
      scalar core can compute DMA source addresses ahead of the stream;
    - a ring of S row-slots in VMEM holds in-flight DMAs: slot j waits,
      accumulates into the output tile, and immediately reissues the DMA
      for row j+S of the stream;
    - accumulation is f32 in a VMEM scratch tile, cast to the output dtype
      once per block.

The kernel is checked against the XLA path in tests (interpret mode on
CPU; compiled on real TPU by the benchmarks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, table_hbm, out_ref, acc_ref, rows_vmem, sems,
                   *, BLK: int, L: int, S: int, out_dtype):
    """One grid step: BLK output rows, each pooling L table rows.

    idx_ref:   (num_flat,) int32 in SMEM (scalar-prefetched, full array)
    table_hbm: (R, d) in HBM (pl.ANY)
    out_ref:   (BLK, d) VMEM output tile for this grid step
    acc_ref:   (BLK, d) f32 VMEM scratch accumulator
    rows_vmem: (S, 1, d) VMEM ring of row landing slots
    sems:      (S,) DMA semaphores
    """
    g = pl.program_id(0)
    base = g * BLK * L  # first flat id of this block's stream
    total = BLK * L

    def dma(stream_pos, slot):
        row_id = idx_ref[base + stream_pos]
        return pltpu.make_async_copy(
            table_hbm.at[pl.ds(row_id, 1), :],
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
        row = rows_vmem[slot][0, :].astype(jnp.float32)
        out_row = pos // L
        acc_ref[out_row, :] += row
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
        _gather_kernel, BLK=BLK, L=L, S=S, out_dtype=table.dtype
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # table stays in HBM
        out_specs=pl.BlockSpec((BLK, d), lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLK, d), jnp.float32),
            pltpu.VMEM((S, 1, d), table.dtype),
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
