import os, time, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo/tests")
import numpy as np
from oracles import watershed_oracle, label_oracle, masks_iou
from microbeseg_tpu.ops.pallas.flood import flood_pallas

N=64
rng = np.random.default_rng(0)
yy, xx = np.mgrid[0:N, 0:N]
cell = np.zeros((N,N), np.float32)
for cy, cx in ((20,20),(20,40),(44,30)):
    d = np.sqrt((yy-cy)**2+(xx-cx)**2)
    cell = np.maximum(cell, np.clip(1-d/12.0, 0, 1))
mask = cell > 0.1
seeds = label_oracle(cell > 0.6)
ref = watershed_oracle(-cell, seeds, mask)
t0=time.time()
ours = np.asarray(flood_pallas(-cell, seeds, mask, n_levels=128, interpret=True))
print("pallas", time.time()-t0, flush=True)
print("fg equal:", ((ours>0)==(ref>0)).all())
print("n labels:", len(np.unique(ours)), len(np.unique(ref)))
print("iou:", masks_iou(ours, ref))
