"""Separable gaussian filtering on device.

Matches ``scipy.ndimage.gaussian_filter`` defaults (truncate=4.0, mode
'reflect') so the smoothing step of distance post-processing is bit-comparable
(reference: src/inference/postprocessing.py:25).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    phi = jnp.exp(-0.5 / (sigma * sigma) * x * x)
    return phi / jnp.sum(phi)


def _correlate1d(x: jnp.ndarray, k: jnp.ndarray, axis: int,
                 radius: int) -> jnp.ndarray:
    """Correlate along ``axis`` with a (2*radius+1,) kernel, scipy
    'reflect' boundaries (np.pad mode='symmetric'), as a moving sum of
    shifted slices (static unroll — no gather)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius, radius)
    xp = jnp.pad(x, pad, mode="symmetric")
    out = jnp.zeros_like(x)
    for i in range(2 * radius + 1):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + x.shape[axis])
        out = out + k[i] * xp[tuple(sl)]
    return out


@partial(jax.jit, static_argnames=("sigma", "truncate"))
def gaussian_filter(img: jnp.ndarray, sigma: float = 0.5,
                    truncate: float = 4.0) -> jnp.ndarray:
    """2D gaussian blur of the trailing two axes (any number of lead axes)."""
    radius = int(truncate * float(sigma) + 0.5)
    if radius == 0:
        return img
    k = _gaussian_kernel1d(float(sigma), radius)
    orig_dtype = img.dtype
    x = img.astype(jnp.float32)
    x = _correlate1d(x, k, x.ndim - 2, radius)
    x = _correlate1d(x, k, x.ndim - 1, radius)
    return x.astype(orig_dtype)


def gaussian_blur_dynamic(img: jnp.ndarray, sigma: jnp.ndarray,
                          radius: int = 9) -> jnp.ndarray:
    """Gaussian blur with a *traced* sigma (for on-device augmentation).

    Kernel support is fixed at ``2*radius+1`` so the op compiles once; weights
    are computed from the runtime sigma.  Used by the Blur augmentation
    (sigma in [1, 2]; reference: src/training/mytransforms.py:57-60 uses
    scipy's truncate=4 => radius <= 8.5, so radius=9 covers the range).
    """
    x32 = img.astype(jnp.float32)
    t = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    phi = jnp.exp(-0.5 / (sigma * sigma) * t * t)
    k = phi / jnp.sum(phi)
    x32 = _correlate1d(x32, k, x32.ndim - 2, radius)
    x32 = _correlate1d(x32, k, x32.ndim - 1, radius)
    return x32.astype(img.dtype)
