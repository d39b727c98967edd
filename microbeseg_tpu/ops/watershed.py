"""Marker-based watershed as bounded-iteration flooding on device.

TPU-native replacement for ``skimage.segmentation.watershed`` (reference:
src/inference/postprocessing.py:57,88).  True priority-flood is a sequential
heap algorithm; here the priority ordering is approximated by quantizing the
image into ``n_levels`` flood levels and propagating labels level by level —
within a level, unlabeled pixels take the label of their lowest-valued labeled
neighbor (4-connectivity, matching skimage's default ``connectivity=1``).
A final fixed-point sweep labels any plateau leftovers.

The whole flood is data-parallel (shifted-slice min/select ops), so it
vmaps over the evaluation threshold grid and batches over frames.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = jnp.float32(3.0e38)

_SHIFTS_4 = ((-1, 0), (1, 0), (0, -1), (0, 1))
_SHIFTS_8 = _SHIFTS_4 + ((-1, -1), (-1, 1), (1, -1), (1, 1))


def _shift(x: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """Value of the neighbor at offset (dy, dx), `fill` outside the image."""
    H, W = x.shape[-2], x.shape[-1]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)],
                 constant_values=fill)
    return xp[..., 1 + dy:1 + dy + H, 1 + dx:1 + dx + W]


def _flood_step(labels, value, active, shifts):
    """One propagation step: unlabeled active pixels take the label of the
    lowest-valued labeled active neighbor."""
    best_v = jnp.full_like(value, _BIG)
    best_l = jnp.zeros_like(labels)
    for dy, dx in shifts:
        nl = _shift(labels, dy, dx, 0)
        nv = _shift(value, dy, dx, _BIG)
        na = _shift(active, dy, dx, False)
        cand_v = jnp.where((nl > 0) & na, nv, _BIG)
        take = cand_v < best_v
        best_v = jnp.where(take, cand_v, best_v)
        best_l = jnp.where(take, nl, best_l)
    grow = (labels == 0) & active & (best_v < _BIG)
    return jnp.where(grow, best_l, labels)


@partial(jax.jit, static_argnames=("n_levels", "inner_steps", "max_final_iters",
                                   "connectivity"))
def watershed(image: jnp.ndarray, markers: jnp.ndarray,
              mask: jnp.ndarray, n_levels: int = 128, inner_steps: int = 2,
              max_final_iters: int = None, connectivity: int = 1) -> jnp.ndarray:
    """Flood ``image`` (lower = flooded first) from ``markers`` within ``mask``.

    image: float (H, W); markers: int (H, W) seed labels; mask: bool (H, W).
    Returns int32 instance labels.

    ``max_final_iters`` defaults to H*W, the true geodesic bound: the
    cleanup while_loop exits as soon as a sweep changes nothing, so the
    large bound is free on converged inputs (cc.py precedent), whereas the
    old fixed 512 silently left pixels further than ~768 4-connected steps
    from any seed unlabeled on large sparse-seeded frames.
    """
    shifts = _SHIFTS_4 if connectivity == 1 else _SHIFTS_8
    if max_final_iters is None:
        max_final_iters = image.shape[-2] * image.shape[-1]
    mask = mask.astype(bool)
    image = image.astype(jnp.float32)
    labels = jnp.where(mask, markers.astype(jnp.int32), 0)

    vmin = jnp.min(jnp.where(mask, image, _BIG))
    vmax = jnp.max(jnp.where(mask, image, -_BIG))
    span = jnp.maximum(vmax - vmin, 1e-20)
    q = jnp.clip(((image - vmin) / span * (n_levels - 1)).astype(jnp.int32),
                 0, n_levels - 1)

    def level_body(lvl, labels):
        active = mask & (q <= lvl)
        for _ in range(inner_steps):
            labels = _flood_step(labels, image, active, shifts)
        return labels

    labels = jax.lax.fori_loop(0, n_levels, level_body, labels)

    # Fixed-point cleanup over the full mask for plateau leftovers.
    def cond(state):
        labels, changed, it = state
        return changed & (it < max_final_iters)

    def body(state):
        labels, _, it = state
        new = _flood_step(labels, image, mask, shifts)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.array(True), jnp.int32(0)))
    return labels


# ---------------------------------------------------------------------------
# Fast variant: drainage labeling + flood cleanup
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("connectivity", "max_cleanup_iters"))
def watershed_fast(image: jnp.ndarray, markers: jnp.ndarray,
                   mask: jnp.ndarray, connectivity: int = 1,
                   max_cleanup_iters: int = None) -> jnp.ndarray:
    """Drainage approximation of marker watershed, O(log HW) gather rounds.

    Each masked pixel points to its lowest 4-neighbor (lexicographic
    (value, index) tie-break guarantees acyclic pointers); pointer doubling
    resolves every pixel to its local minimum in ~log2(HW) rounds; minima
    carrying a marker hand their label to the whole drainage basin.  Pixels
    draining into non-marker minima (rare on smoothed distance fields after
    seed pruning) are filled by the ordered flood cleanup.  Basin boundaries
    land on the same ridges of ``image``, so parity on smooth cell-distance
    predictions stays within the quality gate (tested >= 0.99 IoU vs the heap
    oracle).

    Performance note: asymptotically fewer full-image passes than the level
    flood, but the pointer-doubling rounds are full-image *gathers*, which
    are slow on TPU — measured ~10 ms/crop at 256^2 vs <1 ms for the plain
    flood.  Prefer this variant on CPU; on TPU use ``watershed`` (default) or
    the Pallas in-VMEM flood.
    """
    shifts = _SHIFTS_4 if connectivity == 1 else _SHIFTS_8
    mask = mask.astype(bool)
    H, W = mask.shape
    if max_cleanup_iters is None:
        max_cleanup_iters = H * W  # geodesic bound; early-exit makes it free
    image = image.astype(jnp.float32)
    big = _BIG

    idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W + \
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    val = jnp.where(mask, image, big)

    # lowest neighbor by (value, index); parent = self when self is lowest
    best_v = val
    best_i = idx
    for dy, dx in shifts:
        nv = _shift(val, dy, dx, big)
        ni = _shift(idx, dy, dx, -1)
        na = _shift(mask, dy, dx, False)
        nv = jnp.where(na, nv, big)
        take = (nv < best_v) | ((nv == best_v) & (ni < best_i) & (nv < big))
        best_v = jnp.where(take, nv, best_v)
        best_i = jnp.where(take, ni, best_i)
    parent = jnp.where(mask, best_i, idx).reshape(-1)

    # markers are roots
    labels0 = jnp.where(mask, markers.astype(jnp.int32), 0)
    is_seed = (labels0 > 0).reshape(-1)
    parent = jnp.where(is_seed, jnp.arange(H * W, dtype=jnp.int32), parent)

    # pointer doubling to the root
    n_rounds = max(1, (H * W - 1).bit_length())
    def double(_, p):
        return p[p]
    parent = jax.lax.fori_loop(0, n_rounds, double, parent)

    labels = labels0.reshape(-1)[parent].reshape(H, W)
    labels = jnp.where(mask, labels, 0)

    # cleanup: pixels draining to unlabeled minima -> ordered flood fill
    def cond(state):
        labels, changed, it = state
        return changed & (it < max_cleanup_iters)

    def body(state):
        labels, _, it = state
        new = _flood_step(labels, image, mask, shifts)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.array(True), jnp.int32(0)))
    return labels
