"""Probe: self-contained single-program measurement — params initialized
INSIDE the jitted chain (no big-array arguments, no eager init ops). Tests
whether argument-buffer handling is what makes lower() slow on the relay."""
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
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 16

p("start", MODEL)
cfg = zoo.get_config(MODEL, table_scale=8, param_dtype="bfloat16", compute_dtype="bfloat16")
model = get_model(cfg)
host = RecDataGenerator(cfg, seed=0).generate_batch(512)
dense_np = host.dense
indices_np = host.indices
rows_np = np.asarray(cfg.scaled_rows, dtype=np.int32)[None, :, None]


def program(seed, dense, indices):
    params = model.init(jax.random.PRNGKey(seed))
    rows = jnp.asarray(rows_np)

    def body(i, c):
        idx = (indices + i) % rows
        d = None if dense is None else dense + jnp.float32(i).astype(dense.dtype) * 1e-6
        out = model.apply(params, Batch(dense=d, indices=idx))
        return c + jnp.sum(out.astype(jnp.float32))

    return lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))


fn = jax.jit(program)
dense = None if dense_np is None else jnp.asarray(dense_np)
indices = jnp.asarray(indices_np)
t0 = time.perf_counter()
s = float(fn(0, dense, indices))
p("compile+first", time.perf_counter() - t0, s)
for _ in range(3):
    t0 = time.perf_counter()
    s = float(fn(0, dense, indices))
    p("trial", time.perf_counter() - t0)
