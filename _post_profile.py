"""Device-true timings: each stage is iterated inside one jitted lax.scan
with a data dependence, so one dispatch amortizes the axon tunnel latency."""
import time
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from microbeseg_tpu.ops.filters import gaussian_filter
from microbeseg_tpu.ops.cc import connected_components, relabel_sequential
from microbeseg_tpu.ops.watershed import watershed
from microbeseg_tpu.ops.postprocessing import _prune_small_seeds, distance_postprocessing

N, B, NITER = 256, 8, 10
rng = np.random.default_rng(0)
yy, xx = np.mgrid[0:N, 0:N]
cells = []
for b in range(B):
    cell = np.zeros((N,N), np.float32)
    for _ in range(24):
        cy, cx = rng.integers(10, N-10, 2)
        r = rng.integers(6, 14)
        d = np.sqrt((yy-cy)**2+(xx-cx)**2)
        cell = np.maximum(cell, np.clip(1-d/r, 0, 1))
    cells.append(cell)
cells = jnp.asarray(np.stack(cells))
borders = jnp.clip(cells - jnp.roll(cells, 3, axis=1), 0, 0.3)

def chain_time(name, stage, n=NITER):
    """stage: (cells_batch, i) -> scalar-ish output; scanned n times."""
    @partial(jax.jit, static_argnames=("n",))
    def run(cells, borders, n):
        def body(carry, i):
            c = carry
            out = stage(c, borders, i)
            return c + 1e-7, out
        _, outs = jax.lax.scan(body, cells, jnp.arange(n))
        return jax.tree.map(lambda o: o.sum(), outs)
    run(cells, borders, 2)  # compile small
    r = run(cells, borders, n); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run(cells, borders, n); jax.block_until_ready(r)
    dt1 = time.perf_counter()-t0
    t0 = time.perf_counter()
    r = run(cells, borders, 2*n); jax.block_until_ready(r)
    dt2 = time.perf_counter()-t0
    per = (dt2-dt1)/(n*B)
    print(f"{name}: {1e3*per:.3f} ms/crop", flush=True)

vm = lambda f: jax.vmap(f)
chain_time("gaussian", lambda c, b, i: vm(lambda x: gaussian_filter(x, sigma=0.5))(c))
chain_time("cc+relabel", lambda c, b, i: vm(lambda x: relabel_sequential(connected_components(x > 0.45)))(c).astype(jnp.float32))
chain_time("watershed", lambda c, b, i: vm(lambda x: watershed(-x, (x > 0.6).astype(jnp.int32), x > 0.1))(c).astype(jnp.float32))
chain_time("full_postproc", lambda c, b, i: vm(lambda x, y: distance_postprocessing(y, x, 0.45, 0.10))(c, b).astype(jnp.float32))
