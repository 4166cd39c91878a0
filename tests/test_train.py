import numpy as np
import pytest

from deeprecsys_tpu import zoo
from deeprecsys_tpu.parallel import make_mesh
from deeprecsys_tpu.train import Trainer

SCALE = 2000


def test_trainer_single_device_learns_generalizable_rule():
    # Fresh batch every step: the dense-threshold rule must be LEARNED,
    # not memorized; needs enough steps to generalize.
    cfg = zoo.get_config("rm1", table_scale=SCALE)
    tr = Trainer(cfg, optimizer="adagrad", learning_rate=0.3, loss="bce")
    hist = tr.fit(num_steps=150, batch_size=128, eval_every=50)
    assert np.isfinite(hist.losses).all()
    assert np.mean(hist.losses[-10:]) < np.mean(hist.losses[:10])
    assert hist.eval_aucs and hist.eval_aucs[-1] > 0.7


def test_trainer_sharded_matches_expectations():
    cfg = zoo.get_config("rm1", table_scale=SCALE)
    mesh = make_mesh(data=2, model=4)
    tr = Trainer(cfg, mesh=mesh, optimizer="sgd", learning_rate=0.2, loss="bce")
    hist = tr.fit(num_steps=12, batch_size=64)
    assert np.isfinite(hist.losses).all()
    assert hist.losses[-1] < hist.losses[0]


@pytest.mark.parametrize("opt", ["sgd", "adagrad", "adam"])
def test_all_optimizers_run(opt):
    cfg = zoo.get_config("ncf", table_scale=SCALE)
    tr = Trainer(cfg, optimizer=opt, learning_rate=0.05, loss="mse")
    hist = tr.fit(num_steps=4, batch_size=32)
    assert np.isfinite(hist.losses).all()


def test_quantized_tables_rejected():
    cfg = zoo.get_config("ncf", table_scale=SCALE).replace(table_quant="int8")
    with pytest.raises(ValueError):
        Trainer(cfg)
