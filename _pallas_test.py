import os, sys
if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax, jax.numpy as jnp, time
from jax.experimental.pallas import tpu as pltpu
from microbeseg_tpu.ops.watershed import watershed
from microbeseg_tpu.ops.pallas.flood import flood_pallas

N = 32 if "--tpu" not in sys.argv else 256
yy, xx = np.mgrid[0:N, 0:N]
cell = np.zeros((N,N), np.float32)
rng = np.random.default_rng(0)
for _ in range(3 if N==32 else 24):
    cy, cx = rng.integers(8, N-8, 2)
    r = rng.integers(5, 12)
    d = np.sqrt((yy-cy)**2+(xx-cx)**2)
    cell = np.maximum(cell, np.clip(1-d/r, 0, 1))
mask = cell > 0.1
from scipy import ndimage
seeds, _ = ndimage.label(cell > 0.6, structure=np.ones((3,3)))
seeds = seeds.astype(np.int32)

levels = 16 if N==32 else 128
ref = np.asarray(watershed(-cell, seeds, mask, n_levels=levels))
if "--tpu" in sys.argv:
    t0=time.time()
    ours = np.asarray(flood_pallas(-cell, seeds, mask, n_levels=levels))
    print("pallas compile+run", time.time()-t0, flush=True)
    b = 8
    bv = jnp.asarray(np.stack([-cell]*b)); bm = jnp.asarray(np.stack([seeds]*b)); bk = jnp.asarray(np.stack([mask]*b))
    out = flood_pallas(bv, bm, bk, n_levels=levels); jax.block_until_ready(out)
    t0=time.time()
    for i in range(5):
        out = flood_pallas(bv + 1e-9*i, bm, bk, n_levels=levels)
    jax.block_until_ready(out)
    dt = time.time()-t0
    print(f"pallas batched: {1e3*dt/(5*b):.3f} ms/crop", flush=True)
    # compare with XLA flood timing
    wv = jax.jit(jax.vmap(lambda v, s, m: watershed(v, s, m, n_levels=levels)))
    out2 = wv(bv, bm, bk); jax.block_until_ready(out2)
    t0=time.time()
    for i in range(5):
        out2 = wv(bv + 1e-9*i, bm, bk)
    jax.block_until_ready(out2)
    print(f"xla flood batched: {1e3*(time.time()-t0)/(5*b):.3f} ms/crop", flush=True)
else:
    ours = np.asarray(flood_pallas(-cell, seeds, mask, n_levels=levels, max_final_iters=64, interpret=True))
print("fg equal:", ((ours>0)==(ref>0)).all())
print("labels equal frac:", (ours==ref).mean())
