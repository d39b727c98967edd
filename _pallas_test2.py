import os, time
os.environ["JAX_PLATFORMS"] = "cpu"
t0=time.time()
import numpy as np, jax, jax.numpy as jnp
print("import", time.time()-t0, flush=True)
from microbeseg_tpu.ops.pallas.flood import flood_pallas
N=32
yy, xx = np.mgrid[0:N, 0:N]
cell = np.maximum(np.clip(1-np.sqrt((yy-10)**2+(xx-10)**2)/8,0,1),
                  np.clip(1-np.sqrt((yy-22)**2+(xx-20)**2)/8,0,1)).astype(np.float32)
mask = cell > 0.1
from scipy import ndimage
seeds, _ = ndimage.label(cell > 0.6, structure=np.ones((3,3)))
print("setup done", time.time()-t0, flush=True)
out = flood_pallas(-cell, seeds.astype(np.int32), mask, n_levels=8, inner_steps=1, max_final_iters=32, interpret=True)
print("pallas done", time.time()-t0, flush=True)
out = np.asarray(out)
print("labels:", np.unique(out), flush=True)
