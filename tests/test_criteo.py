"""Criteo/Kaggle dataset adapter tests."""

import jax
import numpy as np
import pytest

from deeprecsys_tpu.data.criteo import (
    CriteoReader,
    criteo_model_config,
    write_synthetic_criteo,
    NUM_INT,
    NUM_CAT,
)
from deeprecsys_tpu.models import get_model
from deeprecsys_tpu.train import Trainer


@pytest.fixture(scope="module")
def criteo_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("criteo") / "train.txt"
    write_synthetic_criteo(p, num_rows=300, seed=3)
    return p


def test_reader_shapes_and_ranges(criteo_file):
    cfg = criteo_model_config(rows_per_table=10_000)
    reader = CriteoReader(criteo_file, cfg)
    batches = list(reader.batches(64))
    assert len(batches) == 4  # 300 rows -> 4 full batches of 64
    batch, labels = batches[0]
    assert batch.dense.shape == (64, NUM_INT)
    assert batch.indices.shape == (64, NUM_CAT, 1)
    assert labels.shape == (64, 1)
    assert set(np.unique(labels)) <= {0.0, 1.0}
    assert batch.indices.min() >= 0
    assert batch.indices.max() < 10_000
    assert (batch.dense >= 0).all()  # log1p of clamped ints


def test_reader_deterministic(criteo_file):
    cfg = criteo_model_config(rows_per_table=10_000)
    a = next(iter(CriteoReader(criteo_file, cfg).batches(32)))
    b = next(iter(CriteoReader(criteo_file, cfg).batches(32)))
    np.testing.assert_array_equal(a[0].indices, b[0].indices)
    np.testing.assert_array_equal(a[0].dense, b[0].dense)


def test_model_runs_on_criteo_batches(criteo_file):
    cfg = criteo_model_config(rows_per_table=5_000)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch, labels = next(iter(CriteoReader(criteo_file, cfg).batches(32)))
    out = np.asarray(model.apply(params, batch))
    assert out.shape == (32, 1)
    assert ((out > 0) & (out < 1)).all()  # sigmoid CTR scores


def test_training_on_criteo(criteo_file):
    import jax.numpy as jnp
    from deeprecsys_tpu.models.base import Batch

    cfg = criteo_model_config(rows_per_table=5_000)
    tr = Trainer(cfg, optimizer="adagrad", learning_rate=0.05, loss="bce",
                 sparse_tables=True, table_learning_rate=0.01)
    reader = CriteoReader(criteo_file, cfg)
    losses = []
    for _ in range(3):  # epochs over the tiny file
        for host, labels in reader.batches(64):
            batch = Batch(dense=jnp.asarray(host.dense), indices=jnp.asarray(host.indices))
            t = jnp.asarray(labels)
            tr.params, tr.opt_state, loss = tr._step(tr.params, tr.opt_state, batch, t)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])  # memorizing the file
