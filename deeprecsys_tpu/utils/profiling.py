"""Device-time measurement via jax.profiler traces.

Why this exists (round 4): the zipf measurement's chained fori_loop —
the wall-clock workaround for the relay's ~35 ms dispatch floor — can
compile a DIFFERENT loop body than the engines' single-call programs
execute, in either direction: rm1's arg-fed negotiated chain read
4.30 ms/iter where the single call's device total is 1.81 ms, and din's
in-program packed chain read 6.78 where the single call is 3.23
(benchmarks/profile_hlo chain_hotcold_* vs hotcold_* traces). Serving
engines dispatch SINGLE apply calls, so the faithful estimator is the
per-call device time: trace K dispatches, sum the HLO op durations on
the device timeline, divide by K. The profiler attributes DMA waits to
their ops and host/python lanes are filtered out, so the sum is the
device-busy time a serving dispatch pays; cross-checks where chain and
call agree (rm1 in-program 1.83 vs 1.81; din arg-fed 3.34 vs 3.23) put
the estimator within ~3% of honest chains.
"""

from __future__ import annotations

import re
import tempfile
from pathlib import Path

# HLO op/fusion events are bare lowercase names (gather.12, fusion.3);
# python frames ($file:line), runtime internals (Foo::Bar) and jit_*
# wrappers are host-side lanes.
_HLO_NAME = re.compile(r"^(?!jit)[a-z][a-z0-9._\-]*$")


def iter_hlo_events(trace_dir):
    """Yield (name, dur_us, args) for every HLO op event in a
    jax.profiler Chrome trace — the one place the event filter lives
    (tools/tpu_workqueue._parse_hlo_trace builds its per-op attribution
    on this same iterator)."""
    import glob
    import gzip
    import json

    (tj,) = glob.glob(str(Path(trace_dir) / "**" / "*.trace.json.gz"),
                      recursive=True)
    for e in json.loads(gzip.open(tj).read()).get("traceEvents", []):
        if e.get("ph") == "X" and _HLO_NAME.match(e.get("name", "")):
            yield e.get("name", ""), float(e.get("dur", 0.0)), e.get("args", {})


def trace_device_us(trace_dir) -> float:
    """Sum of HLO op durations (us) across a jax.profiler Chrome trace."""
    return sum(dur for _, dur, _ in iter_hlo_events(trace_dir))


def traced_call_ms(run_once, calls: int = 8) -> float:
    """Mean per-call DEVICE milliseconds of ``run_once()`` over ``calls``
    traced dispatches. ``run_once`` must block until the call completes
    (e.g. ``lambda: float(jnp.sum(fn(*args))))`` — readback serializes
    the calls so their device windows don't overlap."""
    import shutil

    import jax

    run_once()  # ensure compiled + warm before the traced window
    tmp = tempfile.mkdtemp(prefix="drs_trace_")
    try:
        with jax.profiler.trace(tmp):
            for _ in range(calls):
                run_once()
        return trace_device_us(tmp) / calls / 1000.0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
