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
