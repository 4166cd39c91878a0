"""Warm the remote compile cache for bench.py programs.

Runs bench.measure_model for the given models (identical program → same
cache key as bench.py), so a subsequent bench.py run is compile-warm.
Usage: python tools/warm_bench.py rm1 rm2 ...
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

import bench


def main():
    models = sys.argv[1:] or list(bench.MODELS)
    tpu = [d for d in jax.devices() if d.platform != "cpu"]
    device = tpu[0] if tpu else jax.devices()[0]
    for name in models:
        r = bench.measure_model(name, device, 512, 8, "bfloat16", iters=64)
        print(f"warmed {name}: {r['latency_ms']:.3f} ms/iter "
              f"(compile {r['compile_s']:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
