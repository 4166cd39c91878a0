import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprecsys_tpu import zoo
from deeprecsys_tpu.data import RecDataGenerator
from deeprecsys_tpu.models import get_model
from deeprecsys_tpu.utils.checkpoint import save_params, load_params


def test_save_load_roundtrip(tmp_path):
    cfg = zoo.get_config("ncf", table_scale=1000)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    save_params(tmp_path / "ckpt", params)

    fresh = model.init(jax.random.PRNGKey(99))
    restored = load_params(tmp_path / "ckpt", fresh)
    batch = RecDataGenerator(cfg, seed=1).generate_batch(4)
    out_orig = np.asarray(model.apply(params, batch))
    out_rest = np.asarray(model.apply(restored, batch))
    np.testing.assert_array_equal(out_orig, out_rest)


def test_load_shape_mismatch_rejected(tmp_path):
    cfg = zoo.get_config("ncf", table_scale=1000)
    model = get_model(cfg)
    save_params(tmp_path / "ckpt", model.init(jax.random.PRNGKey(0)))
    other = get_model(zoo.get_config("ncf", table_scale=500))
    with pytest.raises(ValueError):
        load_params(tmp_path / "ckpt", other.init(jax.random.PRNGKey(0)))
