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

Hardware constraints shape the whole design: HBM memrefs are
(sublane, 128)-tiled, so a DMA must copy whole 128-lane lines in
sublane-aligned groups (8 f32 / 16 bf16). The table is therefore viewed
PACKED as (R/k, 128) with k = 128/d logical rows per line (d <= 128), or
(R*k, 128) with k = d/128 lines per row (d >= 128). Each lookup fetches
the aligned block containing its line(s); a VPU mask accumulates the
wanted row into a (BLK, 128) f32 accumulator, and the k lane-groups are
folded once per output block — no dynamic lane shifts anywhere.

Pipeline (pallas_guide.md: PrefetchScalarGridSpec + double buffering,
generalized to an S-deep ring): slot j waits, mask-accumulates, and
immediately reissues the DMA for the lookup S ahead in the stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _sublane(dtype) -> int:
    return {4: 8, 2: 16, 1: 32}[jnp.dtype(dtype).itemsize]


def _narrow_kernel(idx_ref, packed_hbm, out_ref, acc_ref, ring, sems,
                   *, BLK, L, S, ALIGN, K, D, out_dtype):
    """d <= 128 path: K = 128 // d rows per 128-lane line.

    idx_ref:    (num_flat,) int32 fused row ids (scalar-prefetched, SMEM)
    packed_hbm: (R//K, 128) packed table in HBM
    out_ref:    (BLK, D) output tile
    acc_ref:    (BLK, 128) f32 accumulator
    ring:       (S, ALIGN, 128) landing blocks
    sems:       (S,) DMA semaphores
    """
    total = BLK * L

    def dma(pos, slot):
        line = idx_ref[pos] // K
        block = (line // ALIGN) * ALIGN
        return pltpu.make_async_copy(
            packed_hbm.at[pl.ds(block, ALIGN), :], ring.at[slot], sems.at[slot]
        )

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for j in range(S):
        @pl.when(j < total)
        def _():
            dma(j, j).start()

    def body(pos, _):
        slot = jax.lax.rem(pos, S)
        dma(pos, slot).wait()
        r = idx_ref[pos]
        line = r // K
        sub = jax.lax.rem(line, ALIGN)
        half = jax.lax.rem(r, K)
        block = ring[slot].astype(jnp.float32)  # (ALIGN, 128)
        sl = jax.lax.broadcasted_iota(jnp.int32, block.shape, 0)
        ln = jax.lax.broadcasted_iota(jnp.int32, block.shape, 1)
        mask = (sl == sub) & ((ln // D) == half)
        acc_ref[pos // L, :] += jnp.where(mask, block, 0.0).sum(axis=0)
        @pl.when(pos + S < total)
        def _():
            dma(pos + S, slot).start()
        return 0

    jax.lax.fori_loop(0, total, body, 0)
    # Fold the K lane-groups: each lookup landed in exactly one group.
    folded = acc_ref[:, 0:D]
    for j in range(1, K):
        folded = folded + acc_ref[:, j * D:(j + 1) * D]
    out_ref[:] = folded.astype(out_dtype)


def _wide_kernel(idx_ref, packed_hbm, out_ref, acc_ref, ring, sems,
                 *, BLK, L, S, ALIGN, K, D, out_dtype):
    """d >= 128 path: each row spans K = d // 128 consecutive lines."""
    total = BLK * L
    GROUPS = ALIGN // K  # rows per aligned block

    def dma(pos, slot):
        first_line = idx_ref[pos] * K
        block = (first_line // ALIGN) * ALIGN
        return pltpu.make_async_copy(
            packed_hbm.at[pl.ds(block, ALIGN), :], ring.at[slot], sems.at[slot]
        )

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for j in range(S):
        @pl.when(j < total)
        def _():
            dma(j, j).start()

    def body(pos, _):
        slot = jax.lax.rem(pos, S)
        dma(pos, slot).wait()
        first_line = idx_ref[pos] * K
        group = jax.lax.rem(first_line, ALIGN) // K
        block = ring[slot].astype(jnp.float32)  # (ALIGN, 128)
        # Static unroll over possible groups; exactly one matches.
        row = jnp.zeros((K, LANES), jnp.float32)
        for j in range(GROUPS):
            row = row + jnp.where(group == j, block[j * K:(j + 1) * K, :], 0.0)
        acc_ref[pos // L, :] += row.reshape(-1)
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
      table:   (R, d) fused embedding array; d must divide or be a
               multiple of 128. (R is padded internally as needed.)
      offsets: (T,) int32 per-table row offsets.
      indices: (B, T, L) int32 per-table-local ids.

    Returns: (B, T, d) pooled embeddings in the table dtype.

    Note: the packed (.., 128) view is materialized by XLA on entry; for
    production use keep the fused table stored packed (one-time cost here
    keeps the op drop-in for benchmarking).
    """
    B, T, L = indices.shape
    R, d = table.shape
    ALIGN = _sublane(table.dtype)
    if d <= LANES:
        if LANES % d:
            raise ValueError(f"d={d} must divide {LANES}")
        K = LANES // d
        pad_rows = (-R) % (K * ALIGN)
        if pad_rows:
            table = jnp.concatenate([table, jnp.zeros((pad_rows, d), table.dtype)])
        packed = table.reshape(-1, LANES)  # (R/K, 128)
        kernel_fn, acc_lanes = _narrow_kernel, LANES
    else:
        if d % LANES:
            raise ValueError(f"d={d} must be a multiple of {LANES}")
        K = d // LANES
        if ALIGN % K:
            raise ValueError(f"rows of {K} lines must divide the {ALIGN}-line alignment")
        pad_rows = (-R) % ALIGN
        if pad_rows:
            table = jnp.concatenate([table, jnp.zeros((pad_rows, d), table.dtype)])
        packed = table.reshape(-1, LANES)  # (R*K, 128)
        kernel_fn, acc_lanes = _wide_kernel, d

    flat = (indices + offsets[None, :, None]).reshape(-1).astype(jnp.int32)
    n_out = B * T
    # SMEM holds one block of indices (~1 MB total SMEM on v5e); keep a
    # block's index tile comfortably small. The 1-D SMEM block length
    # (BLK*L) must also be a multiple of 128.
    import math

    max_blk_by_smem = max(1, (16 * 1024) // max(L, 1))
    BLK = min(block_rows, max(8, max_blk_by_smem))
    m = LANES // math.gcd(L, LANES)  # smallest BLK granule with BLK*L % 128 == 0
    BLK = max(m, (BLK // m) * m)
    n_blocks = (n_out + BLK - 1) // BLK
    pad_out = n_blocks * BLK - n_out
    if pad_out:
        flat = jnp.concatenate([flat, jnp.zeros((pad_out * L,), jnp.int32)])
    S = min(pipeline_depth, BLK * L)

    kernel = functools.partial(
        kernel_fn, BLK=BLK, L=L, S=S, ALIGN=ALIGN, K=K, D=d if d <= LANES else LANES,
        out_dtype=table.dtype,
    )
    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[
            # This block's BLK*L indices, pipelined into SMEM.
            pl.BlockSpec((BLK * L,), lambda g: (g,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed table stays in HBM
        ],
        out_specs=pl.BlockSpec((BLK, d), lambda g: (g, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLK, acc_lanes), jnp.float32),
            pltpu.VMEM((S, ALIGN, LANES), table.dtype),
            pltpu.SemaphoreType.DMA((S,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLK, d), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(flat, packed)
    return out[:n_out].reshape(B, T, d)
