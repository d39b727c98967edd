"""microbeseg_tpu — TPU-native instance segmentation framework for microbes.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of hip-satomi/microbeSEG
(reference mounted at /root/reference): training-data creation, distance-label
generation, dual-decoder distance-regressing U-Net training, AJI+ evaluation with
threshold search, and watershed-style instance extraction — redesigned so the whole
crop -> instance-mask path runs on device:

- Flax DUNet/UNet (``microbeseg_tpu.models``) in NHWC layout with bfloat16 compute.
- jit/vmap label generation and post-processing kernels (``microbeseg_tpu.ops``):
  exact Euclidean distance transform, connected components, marker-based watershed
  flooding, morphology as ``reduce_window`` ops.
- On-device augmentation + whole-dataset-resident input pipeline and
  data-parallel training over a ``jax.sharding.Mesh`` (``microbeseg_tpu.training``,
  ``microbeseg_tpu.parallel``), replacing the reference's ``nn.DataParallel``
  (reference: src/utils/unets.py:51-52).
- Sliding-window tiled inference with halo stitching (``microbeseg_tpu.inference``),
  a capability the reference stubs but never implements
  (reference: src/inference/infer.py:60-61).
- AJI+/AJI/PQ/Dice metrics and threshold-grid evaluation
  (``microbeseg_tpu.evaluation``; reference: src/evaluation/stats_utils.py).
- Thin OMERO client + local-folder data management (``microbeseg_tpu.client``).
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache, on by default for every entry point
# (CLIs, GUI, examples): the flagship DUNet compiles in minutes at the large
# pad buckets, and without a disk cache every fresh process pays that again
# (measured ~9 min vs ~1 min driving the CLIs).  The reference's analog is
# torch.backends.cudnn.benchmark (microbe_seg.py:23).  setdefault only —
# callers and tests can point it elsewhere or disable with an empty value.
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
