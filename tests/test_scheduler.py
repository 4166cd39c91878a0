import numpy as np

from deeprecsys_tpu.config import ServingConfig
from deeprecsys_tpu.serving.scheduler import DeepRecScheduler, TuningState


def make(cfg_kw=None):
    kw = dict(
        target_latency_ms=10.0,
        min_arr_range=1.0,
        max_arr_range=100.0,
        arr_steps=10,
        sched_timeout=5,
        batch_configs=(32, 64, 128),
        accel_configs=(128, 256),
        stable_region=0.1,
        avg_arrival_rate_ms=10.0,
    )
    kw.update(cfg_kw or {})
    cfg = ServingConfig(**kw)
    state = TuningState(cfg.sub_task_batch_size, cfg.accel_request_size_thres)
    return cfg, state


def test_three_region_controller():
    # Large sched_timeout so the outer config walk never triggers here.
    cfg, state = make({"sched_timeout": 10_000})
    s = DeepRecScheduler(cfg, state, "cpu")
    start = s.arr_id
    s.step(50.0)  # way over SLA -> slower arrivals (higher inter-arrival)
    assert s.arr_id == start + 1
    s.step(1.0)  # far under SLA / (1+region) -> faster arrivals
    assert s.arr_id == start
    s.step(9.5)  # inside stable region [target/(1.1), target] -> hold
    assert s.arr_id == start
    # Clamping at both ends.
    for _ in range(50):
        s.step(100.0)
    assert s.arr_id == len(s.rates) - 1
    for _ in range(50):
        s.step(0.01)
    assert s.arr_id == 0


def test_config_walk_and_backoff():
    cfg, state = make()
    s = DeepRecScheduler(cfg, state, "cpu")
    # Config 1: drive fast (low latency) -> low median inter-arrival.
    for _ in range(cfg.sched_timeout + 1):
        step = s.step(1.0)
    assert step.drain_and_settle
    assert state.sub_task_batch_size == 64  # moved to next config
    assert s.tuning
    # Config 2: drive slow (high latency) -> worse rate -> back off to config 1.
    for _ in range(cfg.sched_timeout + 1):
        step = s.step(100.0)
    assert not s.tuning
    assert state.sub_task_batch_size == 32  # backed off to previous config
    assert s.optimal_config == 32


def test_config_walk_exhaustive_picks_argmin():
    cfg, state = make()
    s = DeepRecScheduler(cfg, state, "cpu")
    # Ratchet latencies so each config converges to a strictly better
    # (lower) rate than the last: 3 configs all tried, last is best.
    lat_per_config = [100.0, 50.0, 1.0]
    # First config establishes a high baseline; subsequent must not trigger
    # backoff (needs config_rates non-increasing).
    for lat in lat_per_config:
        for _ in range(cfg.sched_timeout + 1):
            s.step(lat)
        if not s.tuning:
            break
    assert not s.tuning
    assert s.optimal_config == 128  # last config had the lowest rate
    assert state.sub_task_batch_size == 128


def test_accel_mode_tunes_threshold():
    cfg, state = make()
    s = DeepRecScheduler(cfg, state, "accel")
    for _ in range(cfg.sched_timeout + 1):
        s.step(1.0)
    assert state.accel_request_size_thres == 256  # walked to next config
    for _ in range(cfg.sched_timeout + 1):
        s.step(100.0)
    assert not s.tuning
    assert state.accel_request_size_thres == 128


def test_median_rate_recorded():
    cfg, state = make()
    s = DeepRecScheduler(cfg, state, "cpu")
    for _ in range(cfg.sched_timeout + 1):
        s.step(1.0)
    assert len(s.config_rates) == 1
    # All steps pushed toward the fastest rate; median of last arr_steps
    # attempts should be at/near the min of the range.
    assert s.config_rates[0] <= cfg.avg_arrival_rate_ms
