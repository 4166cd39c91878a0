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


def test_quantized_params_roundtrip(tmp_path):
    """int8 / packed-rowwise tables (dict leaves, int8 dtypes) round-trip
    bit-exactly — the serving-bundle persistence path after
    train.export_serving_params."""
    import jax

    from deeprecsys_tpu import zoo
    from deeprecsys_tpu.models import get_model

    for quant in ("int8", "int8_rowwise"):
        cfg = zoo.get_config("ncf", table_scale=2000).replace(table_quant=quant)
        params = get_model(cfg).init(jax.random.PRNGKey(0))
        p = tmp_path / f"ckpt_{quant}"
        save_params(p, params)
        back = load_params(p, params)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(back)):
            assert a.dtype == b.dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dotted_checkpoint_names_do_not_collide(tmp_path):
    """with_suffix collapsed ckpt.v1 and ckpt.v2 onto one ckpt.npz — the
    second save silently overwrote the first and loads returned the wrong
    weights. Suffixes are appended now."""
    import jax

    from deeprecsys_tpu.utils.checkpoint import load_params, save_params

    a = {"w": np.full((3,), 1.0, np.float32)}
    b = {"w": np.full((3,), 2.0, np.float32)}
    save_params(tmp_path / "ckpt.v1", a)
    save_params(tmp_path / "ckpt.v2", b)
    got_a = load_params(tmp_path / "ckpt.v1", like=a)
    got_b = load_params(tmp_path / "ckpt.v2", like=b)
    np.testing.assert_array_equal(got_a["w"], a["w"])
    np.testing.assert_array_equal(got_b["w"], b["w"])


def test_treedef_sidecar_rejects_wrong_structure(tmp_path):
    """Equal leaf counts + shapes but a DIFFERENT tree structure must be
    rejected by the sidecar check — unflattening into the wrong slots is
    silent weight corruption."""
    import pytest

    from deeprecsys_tpu.utils.checkpoint import load_params, save_params

    saved = {"mlp": {"w": np.zeros((2, 2), np.float32)},
             "final": {"w": np.ones((2, 2), np.float32)}}
    save_params(tmp_path / "ckpt", saved)
    other_structure = {"alpha": {"w": np.zeros((2, 2), np.float32)},
                       "beta": {"w": np.zeros((2, 2), np.float32)}}
    with pytest.raises(ValueError, match="tree structure"):
        load_params(tmp_path / "ckpt", like=other_structure)
