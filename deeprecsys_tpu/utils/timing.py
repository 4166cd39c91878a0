"""Trustworthy device timing.

Through remote/relayed PJRT backends (like the axon tunnel this
environment uses), ``block_until_ready`` can acknowledge before the device
actually finishes, and repeated identical dispatches may be coalesced —
naive timing then reports impossible numbers (we measured "14,000 TFLOP/s"
on a ~200-TFLOP/s chip). The honest fence is a VALUE: make the timed
quantity flow into a scalar inside one jitted program and force its
transfer with ``float()``.

``time_jitted_chain`` therefore:
  1. chains K iterations inside one compiled ``lax.fori_loop`` with a
     data dependence on the loop counter (no hoisting, no dedupe),
  2. reduces the final carry to a scalar inside the jit,
  3. times ``float(fn(...))`` — dispatch + compute + scalar readback —
     and subtracts the separately-measured round-trip floor.

Measured floor on this environment's relay: ~35 ms per call, so chains
should be sized to dominate it (see ``iters``).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

_floor_cache: dict = {}


def roundtrip_floor_ms(device=None, trials: int = 5) -> float:
    """Dispatch + scalar-readback overhead of a trivial jitted program."""
    key = str(device)
    if key in _floor_cache:
        return _floor_cache[key]
    tiny = jax.jit(lambda x: jnp.sum(x), device=device)
    v = jnp.ones((8,), jnp.float32)
    float(tiny(v))
    t0 = time.perf_counter()
    for _ in range(trials):
        float(tiny(v))
    floor = (time.perf_counter() - t0) / trials * 1000.0
    _floor_cache[key] = floor
    return floor


def time_jitted_chain(
    step_fn: Callable,
    init_carry,
    *args,
    iters: int = 32,
    trials: int = 3,
    device=None,
) -> float:
    """Milliseconds per iteration of ``carry = step_fn(i, carry, *args)``.

    ``step_fn`` must make its work depend on both ``i`` and the previous
    carry (perturb inputs with the iteration index so XLA cannot hoist
    loop-invariant compute).
    """

    def chain(carry, *a):
        out = lax.fori_loop(0, iters, lambda i, c: step_fn(i, c, *a), carry)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    fn = jax.jit(chain, device=device)
    float(fn(init_carry, *args))  # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(fn(init_carry, *args))
        best = min(best, time.perf_counter() - t0)
    floor = roundtrip_floor_ms(device) / 1000.0
    return max(best - floor, 1e-9) / iters * 1000.0
