"""Multi-process CPU engines over native shm rings (reference parity:
N OS-process engines, DeepRecSys.py:62-78)."""

import numpy as np
import pytest

from deeprecsys_tpu import zoo
from deeprecsys_tpu.config import ServingConfig
from deeprecsys_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native runtime not built"
)

from deeprecsys_tpu.serving.orchestrator import run_serving


def test_end_to_end_multiprocess_engines():
    model_cfg = zoo.get_config("ncf", table_scale=5000)
    cfg = ServingConfig(
        num_batches=12, nepochs=1, inference_engines=2, engine_backend="cpu-mp",
        avg_arrival_rate_ms=1.0, batch_size_distribution="fixed",
        avg_mini_batch_size=24, max_mini_batch_size=64,
        batch_buckets=(8, 16, 32, 64), sub_task_batch_size=16,
        req_granularity=4, seed=11,
    )
    res = run_serving(model_cfg, cfg, settle_s=0.01)
    assert res.cpu_requests == 12
    assert res.cpu_sub_requests == 24  # 24 -> [16, 8]
    assert res.num_responses == 24
    assert res.measured_qps > 0
    assert np.isfinite(res.p95_ms)
