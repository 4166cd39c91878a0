"""Device selection shared by every benchmark/characterization tool.

One definition so a future change (preferring a particular relay device,
multi-chip pick) cannot silently miss a call site."""

from __future__ import annotations


def pick_accel_device():
    """The accelerator device if any is attached, else the first device
    (CPU-only environments: tests, virtual meshes)."""
    import jax

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    return accel[0] if accel else jax.devices()[0]


def jit_pinned(fn, device=None, **jit_kwargs):
    """``jax.jit`` pinned to ``device`` without the deprecated
    ``jit(device=...)`` argument (removed in jax 0.9).

    Placement semantics preserved for every call site in this repo:
    inputs committed via ``device_put`` already pin execution, and for
    uncommitted inputs (host numpy arrays, python scalars, zero-arg
    programs) the call runs under ``jax.default_device(device)``.
    ``device=None`` is plain ``jax.jit``."""
    import jax

    jitted = jax.jit(fn, **jit_kwargs)
    if device is None:
        return jitted

    def call(*args, **kwargs):
        with jax.default_device(device):
            return jitted(*args, **kwargs)

    return call
