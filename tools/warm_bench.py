"""Warm the remote compile cache for bench.py programs.

Runs bench.measure_model for the given models (identical program → same
cache key as bench.py), so a subsequent bench.py run is compile-warm.
Usage: python tools/warm_bench.py rm1 rm2 ...
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench
from deeprecsys_tpu.utils.devices import pick_accel_device


def main():
    models = sys.argv[1:] or list(bench.MODELS)
    device = pick_accel_device()
    for name in models:
        r = bench.measure_model(name, device, 512, 8, "bfloat16", iters=64)
        print(f"warmed {name}: {r['latency_ms']:.3f} ms/iter "
              f"(compile {r['compile_s']:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
