"""Re-validate the calibrated sim against the RECORDED real-TPU runs.

The real side of benchmarks/sim_validation3.json (one serving run per
model on the chip, job_sim_validation3) is the measurement; the sim side
is reproducible on any CPU from the same recorded calibration inputs
(per-model floor fit a_ms/b_ms_per_mb + per_sample_bytes + the
characterization ladder). After a sim-fidelity change, this tool re-runs
ONLY the sim half at the identical operating point and writes
benchmarks/sim_validation4.json with fresh error bands against the
recorded reals — no TPU time, no contention with the workqueue.

``--sensitivity`` instead sweeps the calibrated dispatch floor a_ms by
±10% and records how the sim's p50/p95 respond
(benchmarks/sim_sensitivity.json): the validated operating points are
SATURATED (offered ~16.7 QPS vs served ~11-14.5), and near saturation
queueing delay amplifies small service-rate error non-linearly — this
artifact measures that amplification factor, which is what honestly caps
the p95 fidelity provable from a relay-calibrated floor (the relay's
round-trip cost is load-dependent; the floor fit is taken at idle).

Usage: python tools/sim_revalidate.py [--sensitivity] [model ...]
"""
import json
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")  # never touch the relay

sys.path.insert(0, str(Path(__file__).parent.parent))

ROOT = Path(__file__).parent.parent


def mk_cfg():
    """The sim_validation operating point (job_sim_validation3.mk_cfg —
    keep in lockstep: same seed, arrivals, size distribution, ladder)."""
    from deeprecsys_tpu.config import ServingConfig

    return ServingConfig(
        num_batches=64, nepochs=1, inference_engines=1,
        engine_backend="sim", avg_arrival_rate_ms=60.0,
        batch_size_distribution="normal", avg_mini_batch_size=165.0,
        var_mini_batch_size=16.0, max_mini_batch_size=1024,
        sub_task_batch_size=64, batch_buckets=(64, 128, 256, 512, 1024),
        req_granularity=16, target_latency_ms=25.0, seed=3,
    )


def revalidate(model: str, rec: dict) -> dict:
    from deeprecsys_tpu import zoo
    from deeprecsys_tpu.serving import run_serving
    from deeprecsys_tpu.serving.latency_model import LatencyModel

    m_cfg = zoo.get_config(model, table_scale=8, param_dtype="bfloat16",
                           compute_dtype="bfloat16")
    fit = rec["floor_fit"]
    ms_per_sample = fit["b_ms_per_mb"] * rec["per_sample_bytes"] / 1e6
    char = ROOT / "benchmarks" / "characterization" / f"tpu_{model}.json"
    lm = LatencyModel.load(char).with_overlap(fit["a_ms"], ms_per_sample)
    sim = run_serving(m_cfg, mk_cfg(), latency_model=lm, settle_s=0.05)
    real = rec["real"]
    out = {
        "model": model, "floor_fit": fit, "transport": "overlap",
        "per_sample_bytes": rec["per_sample_bytes"],
        "sim_model": "serial overlap-transport (max(c,t)+a_ms per "
                     "request — the validated round-3 model)",
        "real": real,  # recorded by job_sim_validation3 on the chip
        "sim": {"qps": sim.measured_qps, "p50_ms": sim.p50_ms,
                "p95_ms": sim.p95_ms, "n": sim.num_responses},
        "p95_rel_err": (sim.p95_ms - real["p95_ms"]) / max(real["p95_ms"], 1e-9),
        "p50_rel_err": (sim.p50_ms - real["p50_ms"]) / max(real["p50_ms"], 1e-9),
        "qps_rel_err": (sim.measured_qps - real["qps"]) / max(real["qps"], 1e-9),
    }
    print(f"{model}: sim QPS {sim.measured_qps:.1f} p50 {sim.p50_ms:.0f} "
          f"p95 {sim.p95_ms:.0f} vs real QPS {real['qps']:.1f} "
          f"p50 {real['p50_ms']:.0f} p95 {real['p95_ms']:.0f} -> "
          f"p95 err {out['p95_rel_err']:+.1%}, p50 err "
          f"{out['p50_rel_err']:+.1%}, qps err {out['qps_rel_err']:+.1%}",
          flush=True)
    return out


def sensitivity(model: str, rec: dict, scales=(0.90, 0.95, 1.0, 1.05, 1.10)):
    from deeprecsys_tpu import zoo
    from deeprecsys_tpu.serving import run_serving
    from deeprecsys_tpu.serving.latency_model import LatencyModel

    m_cfg = zoo.get_config(model, table_scale=8, param_dtype="bfloat16",
                           compute_dtype="bfloat16")
    fit = rec["floor_fit"]
    ms_per_sample = fit["b_ms_per_mb"] * rec["per_sample_bytes"] / 1e6
    char = ROOT / "benchmarks" / "characterization" / f"tpu_{model}.json"
    base = LatencyModel.load(char)
    rows = []
    for s in scales:
        lm = base.with_overlap(fit["a_ms"] * s, ms_per_sample)
        sim = run_serving(m_cfg, mk_cfg(), latency_model=lm, settle_s=0.05)
        rows.append({"a_ms_scale": s, "a_ms": round(fit["a_ms"] * s, 2),
                     "qps": round(sim.measured_qps, 2),
                     "p50_ms": round(sim.p50_ms, 1),
                     "p95_ms": round(sim.p95_ms, 1)})
        print(f"{model} a_ms x{s:.2f}: qps {rows[-1]['qps']} "
              f"p50 {rows[-1]['p50_ms']} p95 {rows[-1]['p95_ms']}",
              flush=True)
    mid = next(r for r in rows if r["a_ms_scale"] == 1.0)
    # Amplification: relative p95 change per relative service change,
    # measured across the ±10% endpoints.
    lo, hi = rows[0], rows[-1]
    span = (hi["a_ms_scale"] - lo["a_ms_scale"])
    amp = ((hi["p95_ms"] - lo["p95_ms"]) / max(mid["p95_ms"], 1e-9)) / span
    return {"model": model, "real": rec["real"], "sweep": rows,
            "p95_amplification_per_unit_a_ms": round(float(amp), 2)}


def main():
    v3 = json.loads((ROOT / "benchmarks" / "sim_validation3.json").read_text())
    args = [a for a in sys.argv[1:] if a != "--sensitivity"]
    sens = "--sensitivity" in sys.argv[1:]
    models = args or sorted(v3)
    if sens:
        path = ROOT / "benchmarks" / "sim_sensitivity.json"
        all_v = json.loads(path.read_text()) if path.exists() else {}
        for m in models:
            all_v[m] = sensitivity(m, v3[m])
        path.write_text(json.dumps(all_v, indent=2))
        amps = {m: all_v[m]["p95_amplification_per_unit_a_ms"]
                for m in models}
        print(f"p95 amplification (rel p95 change per rel a_ms change): "
              f"{amps}")
        return
    path = ROOT / "benchmarks" / "sim_validation4.json"
    all_v = json.loads(path.read_text()) if path.exists() else {}
    for m in models:
        all_v[m] = revalidate(m, v3[m])
    path.write_text(json.dumps(all_v, indent=2))
    errs = [abs(all_v[m]["p95_rel_err"]) for m in models]
    n25 = sum(1 for e in errs if e <= 0.25)
    print(f"p95 within 25%: {n25}/{len(errs)}; max |err| {max(errs):.1%}")


if __name__ == "__main__":
    main()
