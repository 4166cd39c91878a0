"""Table-wise sharding: placement planner + sharded lookup parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprecsys_tpu import zoo
from deeprecsys_tpu.config import ModelConfig
from deeprecsys_tpu.data import RecDataGenerator
from deeprecsys_tpu.ops import embedding_bag, init_fused_tables
from deeprecsys_tpu.parallel import make_mesh
from deeprecsys_tpu.parallel.placement import plan_tablewise_placement
from deeprecsys_tpu.parallel.sharding import build_tablewise_tables, tablewise_embedding_bag


def _cfg(rows, L=4, d=16):
    return ModelConfig(model_type="dlrm", model_name="t",
                       mlp_bot=(8, d), mlp_top=(8, 1),
                       embedding_rows=tuple(rows), sparse_feature_size=d,
                       num_indices_per_lookup=L, interaction_op="cat")


def test_planner_balances_and_permutes():
    cfg = _cfg([100, 10, 10, 10, 100, 10, 10, 10])
    pl = plan_tablewise_placement(cfg, 4)
    assert sorted(pl.perm) == list(range(8))
    assert all(len(g) == 2 for g in pl.tables_per_shard)
    # The two 100-row tables must land on different shards (row balance).
    s0 = pl.shard_of_table[0]
    s4 = pl.shard_of_table[4]
    assert s0 != s4
    assert pl.load_imbalance == pytest.approx(1.0)  # uniform lookup load
    # inverse permutation is consistent
    for old, pos in enumerate(pl.inv_perm):
        assert pl.perm[pos] == old


def test_planner_pads_indivisible_with_virtual_tables():
    pl = plan_tablewise_placement(_cfg([10, 10, 10]), 2)
    assert pl.num_real_tables == 3
    assert len(pl.perm) == 4  # one virtual zero-row slot
    assert all(len(g) == 2 for g in pl.tables_per_shard)


@pytest.mark.parametrize("rows,L,d", [
    ([64, 32, 48, 16, 40, 24, 56, 8], 4, 16),
    ([100, 10, 30, 50], 1, 32),
])
def test_tablewise_lookup_matches_single_device(rows, L, d):
    cfg = _cfg(rows, L=L, d=d)
    mesh = make_mesh(data=2, model=4)
    pl = plan_tablewise_placement(cfg, 4)
    key = jax.random.PRNGKey(0)
    fused = init_fused_tables(key, cfg.scaled_rows, d)
    batch = RecDataGenerator(cfg, seed=1).generate_batch(8)
    idx = jnp.asarray(batch.indices)

    expected = embedding_bag(fused, jnp.asarray(cfg.table_offsets), idx)
    shard_tables = build_tablewise_tables(fused, cfg, pl)
    assert shard_tables.shape[0] == 4
    got = tablewise_embedding_bag(shard_tables, idx, pl, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("name", ["rm1", "wnd", "din"])
def test_tablewise_full_model_parity(name):
    """Any model family on table-wise-sharded embeddings must match the
    single-device forward."""
    from deeprecsys_tpu.models import get_model
    from deeprecsys_tpu.models.base import Batch
    from deeprecsys_tpu.parallel.api import make_tablewise_model

    cfg = zoo.get_config(name, table_scale=20000 if name == "din" else 2000)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    host = RecDataGenerator(cfg, seed=3).generate_batch(8)
    expected = np.asarray(model.apply(params, host))

    mesh = make_mesh(data=4, model=2)
    tw = make_tablewise_model(model, mesh)
    tw_params = tw.convert_params(params)
    batch = Batch(dense=None if host.dense is None else jnp.asarray(host.dense),
                  indices=jnp.asarray(host.indices))
    got = np.asarray(tw.apply(tw_params, batch))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_tablewise_on_din_scale():
    # DIN's skewed tables: two 10M-class tables + many small ones (scaled).
    cfg = zoo.get_config("din", table_scale=20000)
    # 254 tables over 2 shards: planner must split the two big tables.
    pl = plan_tablewise_placement(cfg, 2)
    big = [cfg.num_tables - 2, cfg.num_tables - 1]  # ad + context tables
    assert pl.shard_of_table[big[0]] != pl.shard_of_table[big[1]]
    mesh = make_mesh(data=4, model=2)
    fused = init_fused_tables(jax.random.PRNGKey(0), cfg.scaled_rows, cfg.sparse_feature_size)
    batch = RecDataGenerator(cfg, seed=2).generate_batch(4)
    idx = jnp.asarray(batch.indices)
    expected = embedding_bag(fused, jnp.asarray(cfg.table_offsets), idx)
    got = tablewise_embedding_bag(build_tablewise_tables(fused, cfg, pl), idx, pl, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("quant", ["int8", "int8_rowwise"])
def test_tablewise_quantized_matches_single_device(quant):
    """Table-wise sharding with quantized tables: int8 pools exactly in
    int32 per shard (dequant after the gather-combine); packed rowwise
    dequantizes per row pre-pooling. Output == single-device quantized."""
    import jax.numpy as jnp

    from deeprecsys_tpu.models import get_model
    from deeprecsys_tpu.parallel import make_mesh
    from deeprecsys_tpu.parallel.api import make_tablewise_model

    cfg = zoo.get_config("rm1", table_scale=5000).replace(table_quant=quant)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(2))
    batch = RecDataGenerator(cfg, seed=4).generate_batch(8)
    single = np.asarray(model.apply(params, batch))

    mesh = make_mesh(data=4, model=2)
    tw = make_tablewise_model(model, mesh)
    tw_params = tw.convert_params(params)
    key2d = "qrows" if quant == "int8_rowwise" else "q"
    assert tw_params["tables_tw"].dtype == jnp.int8
    from deeprecsys_tpu.models.base import Batch
    dev_batch = Batch(dense=None if batch.dense is None else jnp.asarray(batch.dense),
                      indices=jnp.asarray(batch.indices))
    got = np.asarray(tw.apply(tw_params, dev_batch))
    np.testing.assert_allclose(got, single, rtol=2e-4, atol=2e-5)


def test_tablewise_masked_matches_masked_single_device():
    """Ragged x table-wise placement (the last bag variant without a
    mask): masked tablewise pooling — mask permuted with its indices,
    virtual pad tables all-false, rows zeroed pre-pool — equals the
    single-device masked bag, and the full tablewise model equals the
    masked direct forward."""
    from deeprecsys_tpu.models import get_model
    from deeprecsys_tpu.models.base import Batch
    from deeprecsys_tpu.ops.embedding import embedding_bag
    from deeprecsys_tpu.parallel.api import make_tablewise_model

    rng = np.random.default_rng(5)
    rows, L, d = [64, 32, 48, 16, 40, 24, 56, 8], 4, 16
    cfg = _cfg(rows, L=L, d=d)
    mesh = make_mesh(data=2, model=4)
    pl = plan_tablewise_placement(cfg, 4)
    fused = init_fused_tables(jax.random.PRNGKey(0), cfg.scaled_rows, d)
    batch = RecDataGenerator(cfg, seed=1).generate_batch(8)
    idx = jnp.asarray(batch.indices)
    T = cfg.num_tables
    lengths = rng.integers(0, L + 1, size=(8, T))  # includes empty groups
    mask = jnp.asarray(np.arange(L)[None, None, :] < lengths[:, :, None])

    expected = embedding_bag(fused, jnp.asarray(cfg.table_offsets), idx,
                             mask=mask)
    got = tablewise_embedding_bag(build_tablewise_tables(fused, cfg, pl),
                                  idx, pl, mesh, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)

    # Full model path: masked tablewise apply == masked direct apply
    # (rm1-style dlrm over the same mesh; jit with the mask sharding).
    mcfg = zoo.get_config("rm1", table_scale=2000)
    model = get_model(mcfg)
    params = model.init(jax.random.PRNGKey(0))
    host = RecDataGenerator(mcfg, seed=3).generate_batch(8)
    Tm, Lm = mcfg.num_tables, mcfg.num_indices_per_lookup
    lengths = rng.integers(0, Lm + 1, size=(8, Tm))
    m2 = np.arange(Lm)[None, None, :] < lengths[:, :, None]
    masked = Batch(dense=jnp.asarray(host.dense),
                   indices=jnp.asarray(host.indices), mask=jnp.asarray(m2))
    want = np.asarray(model.apply(params, masked))
    tw = make_tablewise_model(model, make_mesh(data=4, model=2))
    tw_params = tw.convert_params(params)
    # Unmasked first (mask=None broadcasts over the empty subtree), then
    # masked — both through the SAME jitted apply.
    tw.apply(tw_params, masked._replace(mask=None))
    got2 = np.asarray(tw.apply(tw_params, masked))
    np.testing.assert_allclose(got2, want, rtol=2e-4, atol=2e-5)
