"""Probe: which phase of a chained TPU measurement is slow (init / datagen /
lower / compile / run). Diagnostic for the remote-compile environment."""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp, numpy as np
from jax import lax


def p(*a):
    print(f'[{time.strftime("%H:%M:%S")}]', *a, flush=True)


from deeprecsys_tpu import zoo
from deeprecsys_tpu.data import RecDataGenerator
from deeprecsys_tpu.models import get_model
from deeprecsys_tpu.models.base import Batch

MODEL = sys.argv[1] if len(sys.argv) > 1 else "rm1"
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8

p("start", MODEL)
cfg = zoo.get_config(MODEL, table_scale=8, param_dtype="bfloat16", compute_dtype="bfloat16")
model = get_model(cfg)
t0 = time.perf_counter()
params = model.init(jax.random.PRNGKey(0))
jax.block_until_ready(params)
p("init", time.perf_counter() - t0)
t0 = time.perf_counter()
host = RecDataGenerator(cfg, seed=0).generate_batch(512)
p("datagen", time.perf_counter() - t0)
dense = None if host.dense is None else jnp.asarray(host.dense)
indices = jnp.asarray(host.indices)
rows = jnp.asarray(np.asarray(cfg.scaled_rows, dtype=np.int32))[None, :, None]


def chain(carry, params, dense, indices):
    def body(i, c):
        idx = (indices + i) % rows
        d = None if dense is None else dense + jnp.float32(i).astype(dense.dtype) * 1e-6
        out = model.apply(params, Batch(dense=d, indices=idx))
        return c + jnp.sum(out.astype(jnp.float32))

    return lax.fori_loop(0, ITERS, body, carry)


fn = jax.jit(chain)
t0 = time.perf_counter()
lowered = fn.lower(jnp.zeros((), jnp.float32), params, dense, indices)
p("lower", time.perf_counter() - t0)
t0 = time.perf_counter()
compiled = lowered.compile()
p("compile", time.perf_counter() - t0)
t0 = time.perf_counter()
s = float(compiled(jnp.zeros((), jnp.float32), params, dense, indices))
p("first run+readback", time.perf_counter() - t0, s)
for _ in range(3):
    t0 = time.perf_counter()
    s = float(compiled(jnp.zeros((), jnp.float32), params, dense, indices))
    p("trial", time.perf_counter() - t0)
