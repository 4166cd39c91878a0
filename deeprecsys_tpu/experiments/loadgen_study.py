"""Load-generator study: query-size distribution effects on tail latency.

Reference: ``experiments/load_generator/run_loadGenerator.sh`` — compares
normal(avg 165, var 16) vs lognormal(mu 5.1, sigma 0.2) query-size
distributions at a fixed arrival rate through the full serving stack.

Usage:
    python -m deeprecsys_tpu.experiments.loadgen_study
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from deeprecsys_tpu import zoo
from deeprecsys_tpu.config import ServingConfig
from deeprecsys_tpu.serving import run_serving
from deeprecsys_tpu.serving.latency_model import LatencyModel

DISTS = {
    "normal": dict(batch_size_distribution="normal", avg_mini_batch_size=165.0,
                   var_mini_batch_size=16.0),
    "lognormal": dict(batch_size_distribution="lognormal", avg_mini_batch_size=5.1,
                      var_mini_batch_size=0.2),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ncf")
    ap.add_argument("--backend", default="sim")
    ap.add_argument("--arrival-ms", type=float, default=5.0)
    ap.add_argument("--num-batches", type=int, default=128)
    ap.add_argument("--table-scale", type=int, default=1000)
    ap.add_argument("--out", default="benchmarks/loadgen_study.json")
    args = ap.parse_args(argv)

    rows = []
    for name, dist in DISTS.items():
        cfg = ServingConfig(
            num_batches=args.num_batches, nepochs=1, inference_engines=2,
            engine_backend=args.backend, avg_arrival_rate_ms=args.arrival_ms,
            max_mini_batch_size=1024, sub_task_batch_size=64,
            req_granularity=32, seed=7, **dist,
        )
        lm = LatencyModel([1, 64, 1024], [0.2, 0.6, 4.0]) if args.backend == "sim" else None
        res = run_serving(zoo.get_config(args.model, table_scale=args.table_scale),
                          cfg, latency_model=lm, settle_s=0.05)
        rows.append({"dist": name, "qps": res.measured_qps, "p50_ms": res.p50_ms,
                     "p95_ms": res.p95_ms, "p99_ms": res.p99_ms})
        print(f"{name}: QPS={res.measured_qps:.0f} p50={res.p50_ms:.2f} "
              f"p95={res.p95_ms:.2f} p99={res.p99_ms:.2f} ms", flush=True)
    Path(args.out).parent.mkdir(exist_ok=True)
    Path(args.out).write_text(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
