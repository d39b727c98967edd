"""Region properties via segment reductions.

TPU-native replacement for the ``skimage.measure.regionprops`` calls
(reference: src/training/train.py:76, postprocessing.py:41,81,
train_data_representations.py:234,279,334, analysis.py:162): areas,
centroids, equivalent diameter, major/minor axis lengths — computed for all
instances at once with ``jax.ops.segment_sum`` over the label image instead
of a per-instance Python loop.

Labels must be consecutive 1..n (use ``relabel_sequential``); ``max_labels``
is the static capacity.  Index i of each output corresponds to label i+1.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class RegionProps(NamedTuple):
    area: jnp.ndarray                 # (N,) float32; 0 for absent labels
    centroid: jnp.ndarray             # (N, 2) float32 (row, col)
    equivalent_diameter: jnp.ndarray  # (N,) float32
    major_axis_length: jnp.ndarray    # (N,) float32
    minor_axis_length: jnp.ndarray    # (N,) float32


# above this pixel count the six per-id reductions + the centroid lookup
# switch from segment_sum/gather (~0.4 ms per 65K elements each on this
# hardware) to the radix-matmul machinery of ops/radix.py
_RADIX_PIXELS = 1 << 20


@partial(jax.jit, static_argnames=("max_labels",))
def regionprops(labels: jnp.ndarray, max_labels: int = 256) -> RegionProps:
    H, W = labels.shape
    seg = (labels.reshape(-1) - 1).astype(jnp.int32)  # background -> -1
    seg = jnp.where(seg < 0, max_labels, seg)         # park background in slot N
    ones = jnp.ones((H * W,), jnp.float32)
    yy = jnp.repeat(jnp.arange(H, dtype=jnp.float32), W)
    xx = jnp.tile(jnp.arange(W, dtype=jnp.float32), H)

    n_seg = max_labels + 1
    radix = labels.size > _RADIX_PIXELS

    if radix:
        from microbeseg_tpu.ops.radix import radix_histogram
        area, sy, sx = radix_histogram(seg, max_labels, (ones, yy, xx))
        area, sy, sx = area[:max_labels], sy[:max_labels], sx[:max_labels]
    else:
        area = jax.ops.segment_sum(ones, seg, num_segments=n_seg)[:max_labels]
        sy = jax.ops.segment_sum(yy, seg, num_segments=n_seg)[:max_labels]
        sx = jax.ops.segment_sum(xx, seg, num_segments=n_seg)[:max_labels]

    safe_area = jnp.maximum(area, 1.0)
    cy = sy / safe_area
    cx = sx / safe_area
    centroid = jnp.stack([cy, cx], axis=-1)

    # Central second moments normalized by area (skimage inertia-tensor
    # convention: raw pixel-center moments, no pixel-extent correction).
    # Two-pass: deviations from the per-region centroid, NOT the
    # E[y^2]-E[y]^2 shortcut — at full-frame coordinates (y ~ 2000 in a
    # 2048^2 analysis frame) y^2 sums hit f32 ulp 512 and the subtraction
    # cancels catastrophically, corrupting minor-axis lengths by tens of
    # percent.  The per-pixel centroid lookup is a (max_labels+1,)-table
    # on small inputs (cheap gather); large frames use the radix lookup.
    cy_tab = jnp.concatenate([cy, jnp.zeros((1,), jnp.float32)])
    cx_tab = jnp.concatenate([cx, jnp.zeros((1,), jnp.float32)])
    if radix:
        from microbeseg_tpu.ops.radix import radix_central_moments
        mu20, mu02, mu11 = radix_central_moments(
            seg, max_labels, yy, xx, cy_tab, cx_tab)
        mu20 = mu20[:max_labels] / safe_area
        mu02 = mu02[:max_labels] / safe_area
        mu11 = mu11[:max_labels] / safe_area
    else:
        dy = yy - cy_tab[seg]
        dx = xx - cx_tab[seg]
        mu20 = jax.ops.segment_sum(
            dy * dy, seg, num_segments=n_seg)[:max_labels] / safe_area
        mu02 = jax.ops.segment_sum(
            dx * dx, seg, num_segments=n_seg)[:max_labels] / safe_area
        mu11 = jax.ops.segment_sum(
            dx * dy, seg, num_segments=n_seg)[:max_labels] / safe_area

    common = jnp.sqrt(jnp.maximum((mu20 - mu02) ** 2 + 4.0 * mu11 ** 2, 0.0))
    l1 = (mu20 + mu02 + common) / 2.0
    l2 = (mu20 + mu02 - common) / 2.0
    major = 4.0 * jnp.sqrt(jnp.maximum(l1, 0.0))
    minor = 4.0 * jnp.sqrt(jnp.maximum(l2, 0.0))

    eq_diam = jnp.sqrt(4.0 * area / jnp.pi)

    present = area > 0
    z = jnp.float32(0.0)
    return RegionProps(
        area=jnp.where(present, area, z),
        centroid=jnp.where(present[:, None], centroid, z),
        equivalent_diameter=jnp.where(present, eq_diam, z),
        major_axis_length=jnp.where(present, major, z),
        minor_axis_length=jnp.where(present, minor, z),
    )
