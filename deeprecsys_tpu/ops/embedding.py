"""Fused multi-table pooled embedding lookup.

Reference equivalent: per-table Caffe2 ``SparseLengthsSum``
(``dlrm_s_caffe2.py:319-325`` and clones in every model file) — one C++
gather-sum op per table, parallelized with ``async_dag`` inter-op scheduling
and ``max_num_tasks`` intra-op threads.

TPU-native redesign: all of a model's tables live in ONE ``(total_rows, d)``
array with per-table row offsets, and the whole model's sparse lookup is a
SINGLE fused gather + sum over the pooling axis:

    indices (B, T, L) int32  --(+offsets)-->  rows (B*T*L, d)  --sum L-->  (B, T, d)

Why this shape:
- All eight shipped reference configs use a *fixed* pooling factor
  (``num_indices_per_lookup_fixed: true``), so the ragged CSR form of
  SparseLengthsSum collapses to a dense (B, T, L) index tensor — the
  static-shape form XLA compiles well.
- One gather instead of T (up to 254 for DIN) keeps the HLO small and gives
  XLA one large HBM-bandwidth-bound op to software-pipeline, instead of
  hundreds of tiny ones.
- The fused array is also the unit of model-parallel sharding: rows are
  sharded over the mesh "model" axis (see ``deeprecsys_tpu/parallel``).

A Pallas double-buffered gather kernel for this op lives in
``deeprecsys_tpu/ops/pallas/embedding_kernel.py``; this module is the XLA
path and the numerics reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_fused_tables(key: jax.Array, table_rows, dim: int, dtype=jnp.float32) -> jax.Array:
    """Initialize the fused embedding array for a list of table sizes.

    Matches the reference per-table init distribution
    U(-sqrt(1/n), sqrt(1/n)) (``dlrm_s_caffe2.py:295-300``): one uniform
    draw over the fused array, scaled per-row by its table's bound.
    """
    table_rows = np.asarray(table_rows, dtype=np.int64)
    total = int(table_rows.sum())
    scales = np.repeat(np.sqrt(1.0 / table_rows), table_rows).astype(np.float32)
    u = jax.random.uniform(key, (total, dim), dtype=jnp.float32, minval=-1.0, maxval=1.0)
    return (u * scales[:, None]).astype(dtype)


def init_fused_tables_int8(key: jax.Array, table_rows, dim: int) -> dict:
    """Int8 symmetric quantized fused tables with per-table scales.

    The reference init is U(-sqrt(1/n), sqrt(1/n)) per table, so a
    per-table scale of sqrt(1/n)/127 is the exact symmetric quantizer for
    the init distribution. Returns {"q": (R, d) int8, "scale": (T,) f32}.
    """
    table_rows = np.asarray(table_rows, dtype=np.int64)
    total = int(table_rows.sum())
    bounds = np.sqrt(1.0 / table_rows).astype(np.float32)  # per-table max-abs
    # Values drawn directly on the int8 grid — identical in distribution to
    # quantizing a uniform draw with these scales.
    u = jax.random.randint(key, (total, dim), minval=-127, maxval=128, dtype=jnp.int32)
    return {"q": u.astype(jnp.int8), "scale": jnp.asarray(bounds / 127.0)}


def dedup_indices(indices: np.ndarray, offsets: np.ndarray, bucket_sizes=None):
    """Host-side batch deduplication of fused lookup ids.

    Production id streams are Zipfian: hot rows repeat across a batch
    (exactly the locality the stack-distance trace machinery models). The
    device gather is descriptor-rate-bound per row, so fetching each
    UNIQUE row once and expanding from the small unique set is a direct
    descriptor saving (and the unique set often fits VMEM, where gathers
    run ~3x faster — see benchmarks/README.md).

    Args:
      indices: (B, T, L) int32 per-table-local ids (host numpy).
      offsets: (T,) per-table row offsets into the fused array.
      bucket_sizes: ascending unique-count buckets; the unique list is
        padded to the smallest bucket that fits so jit sees a small set of
        static shapes. Default: powers of two.

    Returns (uniq_padded (U_pad,), inv (B, T, L), n_unique) — padded slots
    repeat uniq[0] (their expanded values are never referenced).
    """
    B, T, L = indices.shape
    flat = (indices.astype(np.int64) + np.asarray(offsets, dtype=np.int64)[None, :, None]).reshape(-1)
    uniq, inv = np.unique(flat, return_inverse=True)
    n = int(uniq.size)
    if bucket_sizes is None:
        u_pad = 1 << max(0, (n - 1)).bit_length()
    else:
        fitting = [b for b in sorted(bucket_sizes) if b >= n]
        u_pad = fitting[0] if fitting else n
    if u_pad > n:
        uniq = np.concatenate([uniq, np.full(u_pad - n, uniq[0] if n else 0)])
    return uniq.astype(np.int32), inv.reshape(B, T, L).astype(np.int32), n


def embedding_bag_dedup(
    table: jax.Array,
    uniq: jax.Array,
    inv: jax.Array,
    *,
    compute_dtype=None,
) -> jax.Array:
    """Pooled lookup over pre-deduplicated ids (see ``dedup_indices``).

    One HBM gather of the U unique rows, then the pooling expansion
    gathers from the small (U, d) set — VMEM-resident when U is modest.
    """
    B, T, L = inv.shape
    rows = jnp.take(table, uniq, axis=0)  # (U_pad, d): the only HBM gather
    if compute_dtype is not None:
        rows = rows.astype(compute_dtype)
    expanded = jnp.take(rows, inv.reshape(-1), axis=0)
    return expanded.reshape(B, T, L, -1).sum(axis=2)


def embedding_bag(
    table: jax.Array,
    offsets: jax.Array,
    indices: jax.Array,
    *,
    compute_dtype=None,
) -> jax.Array:
    """Pooled multi-table lookup.

    Args:
      table: fused ``(total_rows, d)`` embedding array.
      offsets: ``(T,)`` int32 row offset of each table.
      indices: ``(B, T, L)`` int32 per-table-local ids.

    Returns:
      ``(B, T, d)`` pooled (summed over L) embeddings, in ``compute_dtype``
      (defaults to the table dtype).
    """
    B, T, L = indices.shape
    flat = (indices + offsets[None, :, None]).reshape(-1)
    rows = jnp.take(table, flat, axis=0, indices_are_sorted=False, unique_indices=False)
    if compute_dtype is not None:
        rows = rows.astype(compute_dtype)
    return rows.reshape(B, T, L, -1).sum(axis=2)
