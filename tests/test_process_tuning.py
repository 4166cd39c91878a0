"""Regression: DeepRecSched tuning over multiprocess shm-ring engines.

The drain-and-settle path must handle the native ring's Empty type (a
different class from queue.Empty).
"""

import numpy as np
import pytest

from deeprecsys_tpu import zoo
from deeprecsys_tpu.config import ServingConfig
from deeprecsys_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native runtime not built"
)

from deeprecsys_tpu.serving.orchestrator import run_serving


def test_tuning_with_cpu_mp_engines():
    model_cfg = zoo.get_config("ncf", table_scale=5000)
    cfg = ServingConfig(
        num_batches=48, nepochs=1, inference_engines=2, engine_backend="cpu-mp",
        avg_arrival_rate_ms=1.0, batch_size_distribution="fixed",
        avg_mini_batch_size=48, max_mini_batch_size=64,
        batch_buckets=(16, 32, 64), sub_task_batch_size=16,
        req_granularity=4, seed=5,
        tune_batch_qps=True, batch_configs=(16, 32, 64),
        arr_steps=4, sched_timeout=3, target_latency_ms=50.0,
        min_arr_range=0.5, max_arr_range=4.0,
    )
    res = run_serving(model_cfg, cfg, settle_s=0.01)
    assert res.optimal_sub_batch in (16, 32, 64)
    assert res.num_responses > 0
