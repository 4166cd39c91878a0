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
