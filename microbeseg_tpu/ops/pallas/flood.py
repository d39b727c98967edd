"""Pallas TPU kernel: marker-based watershed flood entirely in VMEM.

The XLA-level flood (`ops/watershed.py`) runs hundreds of masked-propagation
passes; under XLA each pass round-trips the (H, W) arrays through HBM and
pays a kernel-launch per loop iteration.  A 256^2 image is only 256 KB in
f32, so the whole working set fits comfortably in VMEM (~16 MB/core): this
kernel runs the complete level loop + fixed-point cleanup on-core, with
neighbor access as `pltpu.roll` + edge masking on the VPU.

The kernel is VPU-bound, so the algorithm is restructured around a single
packed int32 key per pixel — (quantized_level << 12) | label — and each pass
is a plain 4-neighbor key MIN-propagation (~half the vector ops of the
(label, value, active) triple the XLA flood selects over).  Labels must be
< 4096; the seed compaction caps them at `max_seeds` (default 256).  Within
a flood level the packed order prefers the lower label id where the XLA
flood prefers the lower f32 value — measured >= 0.994 per-instance IoU
against the XLA flood on 256^2 blob fields (single ridge pixels differ).
Measured 0.121 ms/crop vs 0.225 for the XLA flood (batch 8, 256^2).

Grid: one program per image of the batch (the threshold-grid / frame batch
rides the grid dimension), so eval's 8-threshold sweep floods 8 images
concurrently across grid steps without host round-trips.

Falls back to the XLA implementation for images larger than
``MAX_VMEM_SIDE`` (VMEM budget) — see ``flood_or_fallback``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38  # python float: a jnp constant would be captured by the kernel

MAX_VMEM_SIDE = 768  # 768^2 f32 ~ 2.3 MB per buffer; ~5 buffers stay < 16 MB


def _shift_masked(x, dy: int, dx: int, fill):
    """Neighbor value at offset (dy, dx) via roll + edge fill (no pad ops,
    which Mosaic does not lower)."""
    H, W = x.shape
    out = x
    if dy != 0:
        # pltpu.roll requires a non-negative shift; normalize modulo the axis
        out = pltpu.roll(out, shift=dy % H, axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        bad = rows < dy if dy > 0 else rows >= H + dy
        out = jnp.where(bad, fill, out)
    if dx != 0:
        out = pltpu.roll(out, shift=dx % W, axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        bad = cols < dx if dx > 0 else cols >= W + dx
        out = jnp.where(bad, fill, out)
    return out


_SHIFTS_4 = ((-1, 0), (1, 0), (0, -1), (0, 1))

# packed flood key: (quantized level << _LABEL_BITS) | label.  Unlabeled /
# inactive pixels carry _BIG_KEY so a single int32 min-propagation replaces
# the (label, value, active) triple of the XLA flood — ~2x fewer VPU ops
# per pass.  Labels must fit _LABEL_BITS (seed compaction caps them at 256).
_LABEL_BITS = 12
_LABEL_MASK = (1 << _LABEL_BITS) - 1
_BIG_KEY = 0x7FFFFFFF


def _key_step(key, qshift, active):
    """One packed propagation step: unlabeled active pixels adopt the label
    of the minimum-key (lowest flood level, then lowest label id) labeled
    active neighbor; a grown pixel re-keys at its OWN level."""
    akey = jnp.where(active, key, _BIG_KEY)
    best = jnp.full_like(key, _BIG_KEY)
    for dy, dx in _SHIFTS_4:
        best = jnp.minimum(best, _shift_masked(akey, dy, dx, _BIG_KEY))
    grow = active & (key == _BIG_KEY) & (best < _BIG_KEY)
    return jnp.where(grow, qshift | (best & _LABEL_MASK), key)


def _flood_kernel(n_levels: int, inner_steps: int, max_final_iters: int,
                  value_ref, markers_ref, mask_ref, out_ref):
    value = value_ref[:]
    mask = mask_ref[:] > 0      # bool: inside the flood domain
    markers = jnp.where(mask, markers_ref[:], 0)

    masked_v = jnp.where(mask, value, _BIG)
    vmin = jnp.min(masked_v)
    vmax = jnp.max(jnp.where(mask, value, -_BIG))
    span = jnp.maximum(vmax - vmin, 1e-20)
    q = jnp.clip(((value - vmin) / span * (n_levels - 1)).astype(jnp.int32),
                 0, n_levels - 1)
    qshift = q << _LABEL_BITS

    key = jnp.where(mask & (markers > 0), qshift | markers, _BIG_KEY)

    def level_body(lvl, key):
        active = mask & (q <= lvl)
        for _ in range(inner_steps):
            key = _key_step(key, qshift, active)
        return key

    key = jax.lax.fori_loop(0, n_levels, level_body, key)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_final_iters)

    def body(state):
        key, _, it = state
        new = _key_step(key, qshift, mask)
        return new, jnp.any(new != key), it + 1

    key, _, _ = jax.lax.while_loop(
        cond, body, (key, jnp.bool_(True), jnp.int32(0)))
    out_ref[:] = jnp.where(key < _BIG_KEY, key & _LABEL_MASK, 0)


@partial(jax.jit, static_argnames=("n_levels", "inner_steps",
                                   "max_final_iters", "interpret"))
def flood_pallas(value: jnp.ndarray, markers: jnp.ndarray,
                 mask: jnp.ndarray, n_levels: int = 128,
                 inner_steps: int = 2,
                 max_final_iters: int = None,
                 interpret: bool = False) -> jnp.ndarray:
    """Batched in-VMEM watershed flood.

    value (B, H, W) f32 (lower floods first), markers (B, H, W) int32,
    mask (B, H, W) bool -> (B, H, W) int32 labels.
    """
    squeeze = value.ndim == 2
    if squeeze:
        value, markers, mask = value[None], markers[None], mask[None]
    B, H0, W0 = value.shape
    # Mosaic lowers rolls/slices on (8, 128)-tiled shapes; pad odd sizes to
    # the tile grid (padding is outside the mask, so the flood ignores it)
    H = -(-H0 // 8) * 8
    W = -(-W0 // 128) * 128
    if (H, W) != (H0, W0):
        pads = ((0, 0), (0, H - H0), (0, W - W0))
        value = jnp.pad(value, pads)
        markers = jnp.pad(markers, pads)
        mask = jnp.pad(mask, pads)
    if max_final_iters is None:
        # true geodesic bound — the cleanup loop early-exits on convergence,
        # so the large bound is free; a fixed 512 left pixels beyond ~768
        # 4-connected steps from any seed unlabeled (watershed.py precedent)
        max_final_iters = H * W
    kernel = partial(_flood_kernel, n_levels, inner_steps, max_final_iters)
    # one image per grid step, whole image as the VMEM block
    img_spec = pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel3d(value_ref, markers_ref, mask_ref, out_ref):
        kernel(value_ref.at[0], markers_ref.at[0], mask_ref.at[0],
               out_ref.at[0])

    out = pl.pallas_call(
        kernel3d,
        grid=(B,),
        in_specs=[img_spec, img_spec, img_spec],
        out_specs=img_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        interpret=interpret,
    )(value.astype(jnp.float32), markers.astype(jnp.int32),
      mask.astype(jnp.int32))
    out = out[:, :H0, :W0]
    return out[0] if squeeze else out


def flood_or_fallback(value, markers, mask, n_levels: int = 128,
                      max_label: int = 4095):
    """Pallas flood for VMEM-sized images, XLA flood otherwise.

    ``max_label``: static upper bound on marker ids.  The packed key
    carries labels in the low 12 bits (key = level << 12 | label), so ids
    >= 4096 would overflow into the level bits and corrupt BOTH fields
    silently — callers with a larger capacity (postprocessing passes its
    seeds cap) are routed to the XLA flood instead."""
    H, W = value.shape[-2], value.shape[-1]
    if max(H, W) <= MAX_VMEM_SIDE and max_label < 4096:
        return flood_pallas(value, markers, mask, n_levels=n_levels)
    from microbeseg_tpu.ops.watershed import watershed
    return watershed(value, markers, mask, n_levels=n_levels)
