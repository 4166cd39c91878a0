"""Concurrency stress: many engines, coalescing, tuning and offload at
once — response accounting must stay exact.

SURVEY §5: the reference has no race detection; its aggregator relies on
benign races over mp.Queue. Our serving fabric (thread queues + native shm
rings + coalescing drain) gets an accounting-exactness stress instead:
every emitted sub-request must produce exactly one response, no dupes, no
losses, under maximum concurrency pressure.
"""

import numpy as np
import pytest

from deeprecsys_tpu import zoo
from deeprecsys_tpu.config import ServingConfig
from deeprecsys_tpu.serving import run_serving
from deeprecsys_tpu.serving.latency_model import LatencyModel


def test_stress_many_engines_offload_and_coalescing():
    model_cfg = zoo.get_config("ncf", table_scale=5000)
    cfg = ServingConfig(
        num_batches=200, nepochs=2, inference_engines=8, engine_backend="sim",
        avg_arrival_rate_ms=0.2,  # flood
        batch_size_distribution="lognormal", avg_mini_batch_size=4.8,
        var_mini_batch_size=0.6, max_mini_batch_size=512,
        sub_task_batch_size=48, req_granularity=16, seed=31,
        model_accel=True, accel_request_size_thres=256,
    )
    lm = LatencyModel([1, 512], [0.05, 0.4])
    accel_lm = LatencyModel([1, 512], [0.02, 0.1])
    res = run_serving(model_cfg, cfg, latency_model=lm, accel_latency_model=accel_lm,
                      settle_s=0.01)
    assert res.cpu_requests + res.accel_requests == 400
    assert res.num_responses == res.cpu_sub_requests + res.accel_requests
    assert res.accel_requests > 0 and res.cpu_requests > 0
    assert np.isfinite(res.p99_ms)


def test_stress_multiprocess_ring_accounting():
    from deeprecsys_tpu.runtime import native

    if not native.native_available():
        pytest.skip("native runtime not built")
    model_cfg = zoo.get_config("ncf", table_scale=5000)
    cfg = ServingConfig(
        num_batches=60, nepochs=1, inference_engines=4, engine_backend="cpu-mp",
        avg_arrival_rate_ms=0.2, batch_size_distribution="fixed",
        avg_mini_batch_size=40, max_mini_batch_size=64,
        batch_buckets=(16, 32, 64), sub_task_batch_size=16,
        req_granularity=8, seed=37,
    )
    res = run_serving(model_cfg, cfg, settle_s=0.01)
    assert res.cpu_requests == 60
    assert res.cpu_sub_requests == 180  # 40 -> [16, 16, 8]
    assert res.num_responses == 180


def test_stress_ingress_soak():
    """Sustained concurrent load through the HTTP ingress: hundreds of
    queries from many client threads; every request answered, stats
    consistent, no stuck pendings."""
    import json
    import threading
    import urllib.request

    from deeprecsys_tpu.serving.ingress import HttpIngress, ServingServer
    from deeprecsys_tpu.serving.latency_model import LatencyModel

    cfg = ServingConfig(engine_backend="sim", inference_engines=4,
                        sub_task_batch_size=32, max_mini_batch_size=128)
    server = ServingServer(zoo.get_config("ncf", table_scale=2000), cfg,
                           latency_model=LatencyModel([1, 128], [0.1, 0.4]))
    server.start()
    ing = HttpIngress(server)
    ing.start()
    host, port = ing.address
    url = f"http://{host}:{port}/v1/infer"

    N_CLIENTS, PER_CLIENT = 16, 20
    errors = []

    def client(cid):
        rng = np.random.default_rng(cid)
        for i in range(PER_CLIENT):
            size = int(rng.integers(1, 128))
            req = urllib.request.Request(
                url, data=json.dumps({"batch_size": size}).encode())
            try:
                with urllib.request.urlopen(req, timeout=60) as r:
                    out = json.loads(r.read())
                    assert out["batch_size"] == size
            except Exception as e:  # pragma: no cover
                errors.append((cid, i, repr(e)))

    try:
        threads = [threading.Thread(target=client, args=(c,)) for c in range(N_CLIENTS)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors[:3]

        stats = server.stats()
        assert stats["completed"] == N_CLIENTS * PER_CLIENT
        assert stats["p99_ms"] > 0
        assert not server._pending  # nothing leaked
    finally:
        ing.stop()  # stops the HTTP listener AND the server's engine pool
