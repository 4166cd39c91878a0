"""Full production lifecycle, end-to-end over real sockets.

The migration story in one test: train a model, checkpoint it, serve it
over the HTTP ingress (real ComputeEngine on the CPU backend), train an
improved version, hot-swap it with ZERO downtime via POST /v1/reload, and
confirm (a) serving never stopped and (b) the engine really serves the new
weights. The reference cannot express any step of this: it re-randomizes
weights on every start and has no ingress, checkpoints, or training.
"""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from deeprecsys_tpu import zoo
from deeprecsys_tpu.config import ServingConfig
from deeprecsys_tpu.serving.ingress import HttpIngress, ServingServer
from deeprecsys_tpu.train import Trainer
from deeprecsys_tpu.utils.checkpoint import save_params


def _post(url, payload):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_train_checkpoint_serve_reload_lifecycle(tmp_path):
    cfg = zoo.get_config("ncf", table_scale=2000)

    # 1. Train v1 briefly and checkpoint it.
    tr = Trainer(cfg, optimizer="adagrad", learning_rate=0.3, loss="bce")
    hist = tr.fit(num_steps=30, batch_size=64)
    assert np.isfinite(hist.losses).all()
    v1 = jax.tree_util.tree_map(np.asarray, tr.params)
    save_params(tmp_path / "ckpt.v1", v1)

    # 2. Serve v1 over HTTP (real engine, CPU backend).
    scfg = ServingConfig(engine_backend="cpu", inference_engines=1,
                         batch_buckets=(16,), max_mini_batch_size=16)
    server = ServingServer(cfg, scfg, params=jax.tree_util.tree_map(np.copy, v1))
    server.start(timeout=300)
    ing = HttpIngress(server)
    ing.start()
    base = "http://%s:%s" % ing.address
    try:
        s, out = _post(f"{base}/v1/infer", {"batch_size": 9})
        assert s == 200 and out["batch_size"] == 9

        # 3. Train v2 (more steps from a different seed) and checkpoint.
        tr2 = Trainer(cfg, optimizer="adagrad", learning_rate=0.3,
                      loss="bce", seed=11)
        tr2.fit(num_steps=30, batch_size=64)
        v2 = jax.tree_util.tree_map(np.asarray, tr2.params)
        save_params(tmp_path / "ckpt.v2", v2)

        # 4. Hot-swap under live traffic: clients keep hitting /v1/infer
        #    while the reload applies.
        stop = threading.Event()
        failures = []

        def client():
            while not stop.is_set():
                try:
                    st, _ = _post(f"{base}/v1/infer", {"batch_size": 5})
                    if st != 200:
                        failures.append(st)
                except Exception as e:  # any dropped request = downtime
                    failures.append(repr(e))

        t = threading.Thread(target=client, daemon=True)
        t.start()
        s, out = _post(f"{base}/v1/reload", {"path": str(tmp_path / "ckpt.v2")})
        assert s == 200 and out["scheduled"] == 1
        # Traffic keeps the engine busy, so the swap applies promptly.
        eng = server.engines[0]
        for _ in range(200):
            st = server.reload_status()
            if st["applied"] == 1:
                break
            _post(f"{base}/v1/infer", {"batch_size": 3})
        stop.set()
        t.join(timeout=30)
        assert not failures, failures[:3]
        st = server.reload_status()
        assert st == {"scheduled": 1, "applied": 1, "failed": 0, "errors": []}

        # 5. The engine genuinely serves v2's weights now (and they differ
        #    from v1's — otherwise the swap assertion is vacuous).
        got = np.asarray(jax.tree_util.tree_leaves(eng.params)[0])
        want_v2 = np.asarray(jax.tree_util.tree_leaves(v2)[0])
        want_v1 = np.asarray(jax.tree_util.tree_leaves(v1)[0])
        assert not np.allclose(want_v1, want_v2)
        np.testing.assert_allclose(got, want_v2, rtol=1e-6)

        # 6. Dotted checkpoint names stayed distinct on disk (v1 intact).
        from deeprecsys_tpu.utils.checkpoint import load_params
        back = load_params(tmp_path / "ckpt.v1", like=v1)
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(back)[0]), want_v1, rtol=1e-6)
    finally:
        ing.stop()
        server.stop()
