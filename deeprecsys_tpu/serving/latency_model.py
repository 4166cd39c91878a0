"""Accelerator latency model (characterization-driven).

Reference: ``accelerator/predict_execution.py`` — parses per-model GPU
sweep results (exec time at batch 4^0..4^5) and predicts latency for an
arbitrary batch size by LINEAR INTERPOLATION IN LOG4 SPACE between the two
bracketing measured points (:67-97). ``accelerator/generate_data.py`` is
the sweep that produces the measurements.

Here the same machinery characterizes OUR engine paths (e.g. the TPU
big-batch path vs. a host path) and powers the sleep-based ``sim`` engine —
the reference's own fake-backend pattern (``accelInferenceEngine.py:58-64``)
that SURVEY.md §4 identifies as the model for hardware-free testing.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

import numpy as np


class LatencyModel:
    """Piecewise log-linear latency vs. batch-size model."""

    def __init__(self, batch_sizes, latencies_ms, base: float = 4.0):
        order = np.argsort(batch_sizes)
        self.batches = np.asarray(batch_sizes, dtype=np.float64)[order]
        self.lat_ms = np.asarray(latencies_ms, dtype=np.float64)[order]
        self.base = float(base)
        if len(self.batches) < 1:
            raise ValueError("need at least one measurement")

    def predict_ms(self, batch_size: int) -> float:
        """Latency for ``batch_size``, interpolated in log-space.

        Mirrors the reference's scheme: exact hit returns the measurement;
        otherwise linear interpolation between the bracketing points on a
        log_base(batch) axis; out-of-range clamps to the end segments'
        slope (the reference only ever queries within its sweep range).
        """
        b = float(batch_size)
        logb = math.log(b, self.base)
        logs = np.log(self.batches) / math.log(self.base)
        if b <= self.batches[0]:
            return float(self.lat_ms[0])
        if b >= self.batches[-1]:
            if len(self.batches) == 1:
                return float(self.lat_ms[-1])
            # extrapolate with the last segment's slope
            slope = (self.lat_ms[-1] - self.lat_ms[-2]) / (logs[-1] - logs[-2])
            return float(self.lat_ms[-1] + slope * (logb - logs[-1]))
        j = int(np.searchsorted(self.batches, b, side="right")) - 1
        frac = (logb - logs[j]) / (logs[j + 1] - logs[j])
        return float(self.lat_ms[j] + frac * (self.lat_ms[j + 1] - self.lat_ms[j]))

    def with_overhead(self, a_ms: float, ms_per_sample: float) -> "LatencyModel":
        """Return a model predicting ``interp(b) + a_ms + ms_per_sample*b``.

        Models a per-dispatch transport cost that is AFFINE IN PAYLOAD
        (payload bytes scale linearly with batch size): ``a_ms`` is the
        scalar dispatch floor, ``ms_per_sample`` the per-sample transfer
        cost. Applied after interpolation — adding it to the ladder points
        instead would bend the affine term through the log-space chords.
        """
        return _OverheadModel(self, float(a_ms), float(ms_per_sample))

    # ------------------------------------------------------------------

    def to_json(self) -> dict:
        return {"batch_sizes": self.batches.tolist(), "latencies_ms": self.lat_ms.tolist(),
                "base": self.base}

    @classmethod
    def from_json(cls, d: dict) -> "LatencyModel":
        m = cls(d["batch_sizes"], d["latencies_ms"], d.get("base", 4.0))
        if d.get("overhead"):  # calibrated transport term round-trips
            o = d["overhead"]
            return m.with_overhead(o["a_ms"], o["ms_per_sample"])
        return m

    def save(self, path: str | Path):
        Path(path).write_text(json.dumps(self.to_json()))

    @classmethod
    def load(cls, path: str | Path) -> "LatencyModel":
        return cls.from_json(json.loads(Path(path).read_text()))


class _OverheadModel(LatencyModel):
    """LatencyModel plus an affine per-dispatch transport term."""

    def __init__(self, base_model: LatencyModel, a_ms: float, ms_per_sample: float):
        super().__init__(base_model.batches, base_model.lat_ms, base=base_model.base)
        self.a_ms = a_ms
        self.ms_per_sample = ms_per_sample

    def predict_ms(self, batch_size: int) -> float:
        return (super().predict_ms(batch_size)
                + self.a_ms + self.ms_per_sample * float(batch_size))

    def to_json(self) -> dict:
        d = super().to_json()
        d["overhead"] = {"a_ms": self.a_ms, "ms_per_sample": self.ms_per_sample}
        return d


def characterize_engine(run_fn, batch_sizes=(1, 4, 16, 64, 256, 1024), warmup: int = 2,
                        iters: int = 5) -> LatencyModel:
    """Sweep ``run_fn(batch_size) -> None`` (blocking until done) over batch
    sizes and fit a LatencyModel — the ``generate_data.py`` analog run
    against our own engine."""
    import time

    lat = []
    for b in batch_sizes:
        for _ in range(warmup):
            run_fn(b)
        t0 = time.perf_counter()
        for _ in range(iters):
            run_fn(b)
        lat.append((time.perf_counter() - t0) / iters * 1000.0)
    return LatencyModel(batch_sizes, lat)
