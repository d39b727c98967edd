"""Exact Euclidean distance transform on device.

TPU-native replacement for ``scipy.ndimage.distance_transform_edt`` as used in
label generation (reference: src/training/train_data_representations.py:244,
289, 317).  Algorithm: separable two-pass squared EDT —

  pass 1: per-column 1D distance to the nearest zero-candidate row, via a
          forward+backward ``lax.scan`` (O(H) with W-wide vector ops);
  pass 2: per-row lower-envelope minimization D2[i,j] = min_k g2[i,k]+(j-k)^2,
          evaluated as a chunked broadcast min (VPU-friendly; no sequential
          parabola stack, which would serialize on TPU).

Supports a ``valid`` mask so windowed per-instance transforms reproduce the
reference's *cropped* EDT exactly: pixels outside ``valid`` are neither
features nor zero-candidates, as if the array ended there.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e12)


def _col_dist_sq(zero_cand: jnp.ndarray) -> jnp.ndarray:
    """Squared vertical distance to the nearest zero-candidate in each column.

    zero_cand: bool (H, W).  Returns float32 (H, W), _BIG where a column has
    no candidate.
    """
    H = zero_cand.shape[0]
    big = jnp.float32(2 * H + 2)  # "infinite" 1D distance, safe to square

    def fwd(carry, zc_row):
        d = jnp.where(zc_row, 0.0, carry + 1.0)
        d = jnp.minimum(d, big)
        return d, d

    init = jnp.full((zero_cand.shape[1],), big, jnp.float32)
    _, down = jax.lax.scan(fwd, init, zero_cand)
    _, up = jax.lax.scan(fwd, init, zero_cand[::-1])
    d1 = jnp.minimum(down, up[::-1])
    d2 = d1 * d1
    return jnp.where(d1 >= big, _BIG, d2)


def _parabola_min(g2: jnp.ndarray, chunk: int = 8) -> jnp.ndarray:
    """D2[i, j] = min_k g2[i, k] + (j - k)^2, chunked over j to bound memory."""
    H, W = g2.shape
    k = jnp.arange(W, dtype=jnp.float32)
    pad_w = (-W) % chunk
    n_chunks = (W + pad_w) // chunk
    j_all = jnp.arange(W + pad_w, dtype=jnp.float32).reshape(n_chunks, chunk)

    def one_chunk(j_chunk):
        # (H, chunk, W) broadcast -> min over k
        d = g2[:, None, :] + (j_chunk[None, :, None] - k[None, None, :]) ** 2
        return jnp.min(d, axis=-1)  # (H, chunk)

    out = jax.lax.map(one_chunk, j_all)           # (n_chunks, H, chunk)
    out = jnp.moveaxis(out, 0, 1).reshape(H, W + pad_w)
    return out[:, :W]


@partial(jax.jit, static_argnames=("chunk",))
def edt(feature: jnp.ndarray, valid: jnp.ndarray | None = None,
        chunk: int = 8) -> jnp.ndarray:
    """Euclidean distance from each feature pixel to the nearest non-feature.

    feature: bool (H, W) — nonzero pixels (scipy: distance at nonzero pixels
    to the nearest zero).  valid: optional bool (H, W) — restrict the domain;
    pixels outside are ignored entirely (emulates a smaller crop).
    Returns float32 (H, W): 0 outside features, else the exact Euclidean
    distance (clamped to 0 where no zero exists in the domain... scipy would
    return +inf-ish full-array distance; our callers normalize by the max so
    the all-feature case is handled upstream).
    """
    feature = feature.astype(bool)
    if valid is None:
        zero_cand = ~feature
        inside = feature
    else:
        valid = valid.astype(bool)
        zero_cand = (~feature) & valid
        inside = feature & valid

    g2 = _col_dist_sq(zero_cand)
    d2 = _parabola_min(g2, chunk=chunk)
    d = jnp.sqrt(jnp.minimum(d2, _BIG))
    d = jnp.where(d2 >= _BIG, 0.0, d)
    return jnp.where(inside, d, 0.0).astype(jnp.float32)
