"""Pallas kernels vs. XLA reference numerics (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deeprecsys_tpu.ops import embedding_bag
from deeprecsys_tpu.ops.pallas import pallas_embedding_bag


@pytest.mark.parametrize("B,T,L,d", [(4, 3, 5, 32), (8, 2, 1, 64), (3, 7, 4, 16)])
def test_pallas_embedding_bag_matches_xla(B, T, L, d):
    rng = np.random.default_rng(0)
    table_rows = [60, 40, 30, 25, 20, 15, 10][:T]
    offsets = np.concatenate([[0], np.cumsum(table_rows)[:-1]]).astype(np.int32)
    total = int(np.sum(table_rows))
    table = jnp.asarray(rng.normal(size=(total, d)).astype(np.float32))
    idx = np.stack(
        [np.stack([rng.integers(0, n, size=L) for n in table_rows]) for _ in range(B)]
    ).astype(np.int32)
    ref = embedding_bag(table, jnp.asarray(offsets), jnp.asarray(idx))
    got = pallas_embedding_bag(
        table, jnp.asarray(offsets), jnp.asarray(idx),
        interpret=True, block_rows=4, pipeline_depth=4,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_pallas_embedding_bag_block_padding():
    # n_out (B*T) deliberately NOT a multiple of block_rows.
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(50, 8)).astype(np.float32))
    offsets = jnp.asarray(np.array([0, 25], dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, 25, size=(5, 2, 3)).astype(np.int32))
    ref = embedding_bag(table, offsets, idx)
    got = pallas_embedding_bag(table, offsets, idx, interpret=True,
                               block_rows=4, pipeline_depth=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_pallas_embedding_bag_wide_rows():
    # d > 128 path: each row spans multiple 128-lane lines.
    rng = np.random.default_rng(3)
    d = 256
    table = jnp.asarray(rng.normal(size=(40, d)).astype(np.float32))
    offsets = jnp.asarray(np.array([0, 24], dtype=np.int32))
    idx = np.stack([np.stack([rng.integers(0, n, size=2) for n in (24, 16)])
                    for _ in range(6)]).astype(np.int32)
    ref = embedding_bag(table, offsets, jnp.asarray(idx))
    got = pallas_embedding_bag(table, offsets, jnp.asarray(idx), interpret=True,
                               block_rows=4, pipeline_depth=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_pallas_embedding_bag_bf16():
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32)).astype(jnp.bfloat16)
    offsets = jnp.asarray(np.array([0], dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, 64, size=(4, 1, 8)).astype(np.int32))
    ref = embedding_bag(table, offsets, idx, compute_dtype=jnp.float32).astype(jnp.bfloat16)
    got = pallas_embedding_bag(table, offsets, idx, interpret=True,
                               block_rows=4, pipeline_depth=4)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got.astype(jnp.float32)), np.asarray(ref.astype(jnp.float32)),
        rtol=2e-2, atol=1e-2,
    )


@pytest.mark.parametrize("B,T,L,d", [(4, 3, 5, 64), (8, 2, 7, 32)])
def test_pallas_coalesced_matches_xla(B, T, L, d):
    """Extent-coalesced kernel (one DMA per distinct touched extent of
    the sorted stream) computes the exact pooled lookup."""
    from deeprecsys_tpu.ops.pallas.embedding_kernel import (
        pallas_embedding_bag_coalesced)

    rng = np.random.default_rng(B * d)
    R = 512
    table = rng.normal(size=(R, d)).astype(np.float32)
    row_counts = np.full(T, R // T)
    offsets = np.concatenate([[0], np.cumsum(row_counts)[:-1]]).astype(np.int32)
    idx = rng.integers(0, row_counts[None, :, None], size=(B, T, L)).astype(np.int32)
    want = embedding_bag(jnp.asarray(table), jnp.asarray(offsets), jnp.asarray(idx))
    got = pallas_embedding_bag_coalesced(jnp.asarray(table), offsets, idx,
                                         interpret=True, chunk=16, ext=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_coalesced_prepass_counters():
    """The prepass's own accounting: codes cover all lookups, DMA count
    equals the number of distinct (chunk, extent) pairs, and duplicate-
    heavy streams coalesce to far fewer DMAs than lookups."""
    from deeprecsys_tpu.ops.pallas.embedding_kernel import coalesce_prepass

    rng = np.random.default_rng(0)
    flat = rng.integers(0, 4096, size=(4096,), dtype=np.int64)
    pre = coalesce_prepass(flat, 8, 64, 2, chunk=512, ext=16)
    assert pre["code"].size == pre["n_chunks"] * pre["chunk"]
    counts = pre["ext_line"].reshape(pre["n_chunks"], -1)[:, pre["e_max"]]
    assert pre["n_dmas"] == counts.sum() > 0
    # 4096 uniform lookups over 4096 rows = 2048 lines = 128 extents:
    # massive sharing, so DMAs must be far below lookup count.
    assert pre["n_dmas"] < flat.size // 4
