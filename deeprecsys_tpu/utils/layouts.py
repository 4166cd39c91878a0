"""Parameter-layout negotiation for serving engines.

XLA's gather emitter prefers a COLUMN-MAJOR fused-table layout for
narrow rows (d=32: a (R, 32) row-major array wastes 3/4 of every
T(8,128) tile, so XLA transposes) and row-major for >=128-byte rows.
When a jitted apply's parameter arrives in the non-preferred layout, XLA
bakes a whole-table relayout copy into the executable — paid on EVERY
call: measured 1.83 ms for a 256 MB bf16 (4M, 32) table
(benchmarks/profile_hlo, hlo_profile2:rm1 copy.7; ~7 ms/GB). Eager init
and checkpoint loads produce default (row-major) layouts, so unpacked
narrow-row serving engines hit exactly this.

Fix: one AUTO-layout negotiation compile at engine setup
(``jax.jit(fn, in_shardings=Format(Layout.AUTO)).lower(...).compile()``)
reads the layouts the executable actually wants, and params are
``device_put`` into them ONCE. Every subsequent bucket compile sees
preferred-layout parameters and emits no copy.
"""

from __future__ import annotations


def negotiated_param_formats(apply_fn, device, *arg_shapes):
    """The Format tree XLA prefers for ``apply_fn``'s FIRST positional
    argument (the params), negotiated on ``device``.

    ``arg_shapes`` are ShapeDtypeStruct pytrees for every positional
    argument (params first). Returns None — and the caller keeps the
    default layouts — if negotiation fails (API churn, exotic backends):
    the copy is a performance bug, not a correctness one.
    """
    import jax

    try:
        from jax.experimental.layout import Format, Layout

        with jax.default_device(device):
            lowered = jax.jit(
                apply_fn, in_shardings=Format(Layout.AUTO)).lower(*arg_shapes)
            compiled = lowered.compile()
        return compiled.input_formats[0][0]
    except Exception as e:  # pragma: no cover — defensive across jax versions
        print(f"[deeprecsys_tpu] WARNING: param-layout negotiation failed "
              f"({type(e).__name__}: {e}); serving with default layouts "
              f"(narrow-row tables may pay a per-call relayout copy)",
              flush=True)
        return None


def shape_tree(tree):
    """ShapeDtypeStruct skeleton of a pytree of arrays (Nones pass through)."""
    import jax

    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


