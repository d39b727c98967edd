"""Binary and grayscale morphology as XLA reduce-window ops.

TPU-native equivalents of the ``scipy.ndimage`` morphology calls in label
generation (reference: src/training/train_data_representations.py:54-68,
94, 120, 149-152, 340, 359).  Boundary semantics match scipy defaults:
binary ops treat outside-of-image as 0 (``border_value=0``); grayscale
closing uses 'reflect' (symmetric) padding.

Structuring elements are boolean (kh, kw) arrays; ``disk(r)`` matches
``skimage.morphology.disk``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def disk(radius: int) -> np.ndarray:
    """Boolean disk structuring element (skimage.morphology.disk parity)."""
    y, x = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    return (x * x + y * y) <= radius * radius


def generate_binary_structure(rank: int = 2, connectivity: int = 1) -> np.ndarray:
    """scipy.ndimage.generate_binary_structure for rank 2."""
    assert rank == 2
    if connectivity == 1:
        return np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=bool)
    return np.ones((3, 3), dtype=bool)


def _select_window(x: jnp.ndarray, se: np.ndarray, reducer, pad_value) -> jnp.ndarray:
    """Reduce over the structuring-element footprint via shifted slices.

    For the small SEs used here (3x3 .. disk(4)) this unrolls into a handful
    of fused elementwise ops — faster than generic gather and fully
    XLA-fusible.  x may have leading batch axes; the SE applies to the
    trailing two.
    """
    se = np.asarray(se, dtype=bool)
    kh, kw = se.shape
    ph, pw = kh // 2, kw // 2
    pad = [(0, 0)] * (x.ndim - 2) + [(ph, ph), (pw, pw)]
    xp = jnp.pad(x, pad, mode="constant", constant_values=pad_value)
    out = None
    H, W = x.shape[-2], x.shape[-1]
    for dy in range(kh):
        for dx in range(kw):
            if not se[dy, dx]:
                continue
            sl = (Ellipsis, slice(dy, dy + H), slice(dx, dx + W))
            piece = xp[sl]
            out = piece if out is None else reducer(out, piece)
    return out


def binary_dilation(x: jnp.ndarray, se: np.ndarray | None = None) -> jnp.ndarray:
    if se is None:
        se = generate_binary_structure(2, 1)
    xb = x.astype(bool)
    return _select_window(xb, se, jnp.logical_or, False)


def binary_erosion(x: jnp.ndarray, se: np.ndarray | None = None) -> jnp.ndarray:
    if se is None:
        se = generate_binary_structure(2, 1)
    xb = x.astype(bool)
    return _select_window(xb, se, jnp.logical_and, False)


def binary_closing(x: jnp.ndarray, se: np.ndarray | None = None) -> jnp.ndarray:
    """Dilation then erosion, scipy border semantics (outside = 0)."""
    return binary_erosion(binary_dilation(x, se), se)


def binary_opening(x: jnp.ndarray, se: np.ndarray | None = None) -> jnp.ndarray:
    return binary_dilation(binary_erosion(x, se), se)


@partial(jax.jit, static_argnames=("size",))
def grey_closing(x: jnp.ndarray, size=(3, 3)) -> jnp.ndarray:
    """Grayscale closing (max filter then min filter), reflect boundary.

    Parity target: scipy.ndimage.grey_closing(x, size=(3, 3)) as used on the
    neighbor-distance label (reference: train_data_representations.py:359).
    """
    se = np.ones(size, dtype=bool)
    kh, kw = size
    ph, pw = kh // 2, kw // 2
    pad = [(0, 0)] * (x.ndim - 2) + [(ph, ph), (pw, pw)]

    xp = jnp.pad(x, pad, mode="symmetric")
    dil = _shifted_reduce(xp, x.shape, se, jnp.maximum)
    dp = jnp.pad(dil, pad, mode="symmetric")
    return _shifted_reduce(dp, x.shape, se, jnp.minimum)


def _shifted_reduce(xp, out_shape, se, reducer):
    H, W = out_shape[-2], out_shape[-1]
    out = None
    for dy in range(se.shape[0]):
        for dx in range(se.shape[1]):
            if not se[dy, dx]:
                continue
            piece = xp[(Ellipsis, slice(dy, dy + H), slice(dx, dx + W))]
            out = piece if out is None else reducer(out, piece)
    return out
