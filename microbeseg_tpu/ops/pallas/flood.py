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

# packed flood key: (quantized level << label_bits) | label.  Unlabeled /
# inactive pixels carry _BIG_KEY so a single int32 min-propagation replaces
# the (label, value, active) triple of the XLA flood — ~2x fewer VPU ops
# per pass.  Labels must fit label_bits: 12 on the hot crop path (seed
# compaction caps them at 256), 24 on the tiled large-frame path (global
# area-scaled ids up to 2^24; n_levels <= 128 keeps level bits + label bits
# + sign inside int32).
_LABEL_BITS = 12
_BIG_KEY = 0x7FFFFFFF


def _key_step(key, qshift, active, label_mask):
    """One packed propagation step: unlabeled active pixels adopt the label
    of the minimum-key (lowest flood level, then lowest label id) labeled
    active neighbor; a grown pixel re-keys at its OWN level."""
    akey = jnp.where(active, key, _BIG_KEY)
    best = jnp.full_like(key, _BIG_KEY)
    for dy, dx in _SHIFTS_4:
        best = jnp.minimum(best, _shift_masked(akey, dy, dx, _BIG_KEY))
    grow = active & (key == _BIG_KEY) & (best < _BIG_KEY)
    return jnp.where(grow, qshift | (best & label_mask), key)


def _flood_kernel(n_levels: int, inner_steps: int, max_final_iters: int,
                  label_bits: int,
                  value_ref, markers_ref, mask_ref, out_ref):
    label_mask = (1 << label_bits) - 1
    value = value_ref[:]
    mask = mask_ref[:] > 0      # bool: inside the flood domain
    markers = jnp.where(mask, markers_ref[:], 0)

    masked_v = jnp.where(mask, value, _BIG)
    vmin = jnp.min(masked_v)
    vmax = jnp.max(jnp.where(mask, value, -_BIG))
    span = jnp.maximum(vmax - vmin, 1e-20)
    q = jnp.clip(((value - vmin) / span * (n_levels - 1)).astype(jnp.int32),
                 0, n_levels - 1)
    qshift = q << label_bits

    key = jnp.where(mask & (markers > 0), qshift | markers, _BIG_KEY)

    def level_body(lvl, key):
        active = mask & (q <= lvl)
        for _ in range(inner_steps):
            key = _key_step(key, qshift, active, label_mask)
        return key

    key = jax.lax.fori_loop(0, n_levels, level_body, key)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_final_iters)

    def body(state):
        key, _, it = state
        new = _key_step(key, qshift, mask, label_mask)
        return new, jnp.any(new != key), it + 1

    key, _, _ = jax.lax.while_loop(
        cond, body, (key, jnp.bool_(True), jnp.int32(0)))
    out_ref[:] = jnp.where(key < _BIG_KEY, key & label_mask, 0)


@partial(jax.jit, static_argnames=("n_levels", "inner_steps",
                                   "max_final_iters", "label_bits",
                                   "interpret"))
def flood_pallas(value: jnp.ndarray, markers: jnp.ndarray,
                 mask: jnp.ndarray, n_levels: int = 128,
                 inner_steps: int = 2,
                 max_final_iters: int = None,
                 label_bits: int = _LABEL_BITS,
                 interpret: bool = False) -> jnp.ndarray:
    """Batched in-VMEM watershed flood.

    value (B, H, W) f32 (lower floods first), markers (B, H, W) int32,
    mask (B, H, W) bool -> (B, H, W) int32 labels.  ``label_bits`` sets
    the packed-key split (markers must be < 2**label_bits).
    """
    assert label_bits + max(1, (n_levels - 1).bit_length()) <= 31, (
        f"packed key overflow: {label_bits} label bits x {n_levels} levels")
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
    kernel = partial(_flood_kernel, n_levels, inner_steps, max_final_iters,
                     label_bits)
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


def _packed_flood_kernel(n_levels: int, inner_steps: int,
                         max_final_iters: int, label_bits: int,
                         qs_ref, key_ref, out_ref):
    """Two-plane variant of ``_flood_kernel`` for the tiled path.

    ``qs`` packs level AND mask: in-mask pixels carry ``q << label_bits``
    (zero low bits), out-of-mask pixels the sentinel ``_BIG_KEY`` — above
    every possible ``lvl << label_bits``, so they are never active and
    never grown (``n_levels << label_bits`` would overflow int32 at 128
    levels x 24 label bits).  ``key`` is the
    usual packed key with seeds pre-planted by the XLA caller.  CONTRACT:
    the caller must set the window's outermost ring of ``qs`` to the
    sentinel (flood_tiled guards it) — shifts are pure wraparound rolls,
    and an active ring pixel would leak across the wrap.  Two input
    blocks instead of three (plus the key block aliased to the output,
    plus no iota edge-mask planes) keeps the double-buffered window set
    inside the ~16 MB VMEM budget — the 3-plane kernel measured 16.9 MB
    at 640^2 windows and failed to compile."""
    label_mask = (1 << label_bits) - 1
    qs = qs_ref[:]
    key = key_ref[:]
    H, W = qs.shape

    def kstep(key, active):
        akey = jnp.where(active, key, _BIG_KEY)
        best = jnp.full_like(key, _BIG_KEY)
        for dy, dx in _SHIFTS_4:
            # pure wraparound roll: the caller guards the window's
            # outermost ring as inactive/_BIG_KEY, so wrapped reads only
            # ever deliver _BIG_KEY (no iota edge masks -> fewer VMEM
            # buffers and ~half the VPU ops of the masked shift)
            best = jnp.minimum(best, pltpu.roll(
                akey, shift=(dy % H) if dy else (dx % W),
                axis=0 if dy else 1))
        grow = active & (key == _BIG_KEY) & (best < _BIG_KEY)
        return jnp.where(grow, qs | (best & label_mask), key)

    def level_body(lvl, key):
        active = qs <= (lvl << label_bits)
        for _ in range(inner_steps):
            key = kstep(key, active)
        return key

    key = jax.lax.fori_loop(0, n_levels, level_body, key)

    in_mask = qs < _BIG_KEY

    def cond(state):
        _, changed, it = state
        return changed & (it < max_final_iters)

    def body(state):
        key, _, it = state
        new = kstep(key, in_mask)
        return new, jnp.any(new != key), it + 1

    key, _, _ = jax.lax.while_loop(
        cond, body, (key, jnp.bool_(True), jnp.int32(0)))
    out_ref[:] = jnp.where(key < _BIG_KEY, key & label_mask, 0)


@partial(jax.jit, static_argnames=("n_levels", "inner_steps",
                                   "max_final_iters", "label_bits",
                                   "interpret"))
def _flood_packed(qs: jnp.ndarray, key0: jnp.ndarray, n_levels: int,
                  inner_steps: int = 2, max_final_iters: int = None,
                  label_bits: int = 24, interpret: bool = False):
    """Batched packed-plane flood: qs/key0 (B, H, W) int32 (H, W already on
    the (8, 128) grid) -> (B, H, W) int32 labels."""
    B, H, W = qs.shape
    if max_final_iters is None:
        max_final_iters = H * W
    kernel = partial(_packed_flood_kernel, n_levels, inner_steps,
                     max_final_iters, label_bits)
    img_spec = pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel3d(qs_ref, key_ref, out_ref):
        kernel(qs_ref.at[0], key_ref.at[0], out_ref.at[0])

    return pl.pallas_call(
        kernel3d,
        grid=(B,),
        in_specs=[img_spec, img_spec],
        out_specs=img_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        input_output_aliases={1: 0},  # key0 block doubles as the output
        # sequential grid: stops the pipeliner from multi-buffering window
        # blocks beyond double-buffering on long grids (64 windows at 640^2
        # measured 18.6 MB scoped VMEM and failed; 16 windows fit)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(qs, key0)


@partial(jax.jit, static_argnames=("n_levels", "tile", "halo", "interpret"))
def flood_tiled(value: jnp.ndarray, markers: jnp.ndarray, mask: jnp.ndarray,
                n_levels: int = 128, tile: int = 512, halo: int = 64,
                interpret: bool = False) -> jnp.ndarray:
    """Tiled in-VMEM flood for frames beyond the VMEM side limit.

    The XLA flood pays ~n_levels * inner_steps full-frame HBM passes (the
    dominant post-processing stage at 4096^2); here the level loop runs
    per (tile + 2*halo)^2 window entirely in VMEM with GLOBAL level
    quantization (each window floods on the same level grid), window
    interiors paste back, and one XLA fixed-point sweep loop labels the
    rare pixels whose basin reaches beyond the halo (early-exits on
    convergence).  Labels ride 24 packed bits (area-scaled seed caps go to
    32768).  A window-interior pixel whose true basin seed lies outside
    the window+halo may tie-break differently than the full-frame flood —
    same deviation class as the quantized flood itself (tested >= 0.99
    per-instance IoU against the XLA flood).

    value (H, W) f32, markers (H, W) int32 (< 2^24), mask (H, W) bool.
    Window mechanics (carve, ring guard, grid chunking, interior paste)
    live in ``pallas/windows.py``; the default 512+2*64 geometry fits the
    VMEM budget (the 3-plane kernel at 768^2 measured 20 MB and the
    2-plane at 640^2 18.6 MB on long grids — hence 2 planes + chunking).
    64 px halo covers the corpus cell radii; the cleanup sweep handles
    anything larger.
    """
    H, W = value.shape[-2], value.shape[-1]
    label_bits = 24
    assert n_levels <= 128, (
        f"24-bit packed labels leave 7 level bits: n_levels {n_levels} > 128"
        " would overflow the int32 key")
    value = value.astype(jnp.float32)
    mask = mask.astype(bool)
    markers = jnp.where(mask, markers.astype(jnp.int32), 0)

    # global quantization: every window floods on the same level grid
    vmin = jnp.min(jnp.where(mask, value, _BIG))
    vmax = jnp.max(jnp.where(mask, value, -_BIG))
    span = jnp.maximum(vmax - vmin, 1e-20)
    q = jnp.clip(((value - vmin) / span * (n_levels - 1)).astype(jnp.int32),
                 0, n_levels - 1)

    # packed planes: qs = level<<bits (_BIG_KEY sentinel outside the mask —
    # n_levels<<24 would overflow int32), key0 = seeded packed keys — two
    # window blocks instead of three for VMEM
    sentinel = _BIG_KEY
    qs = jnp.where(mask, q << label_bits, sentinel)
    key0 = jnp.where(markers > 0, qs | markers, _BIG_KEY)

    from microbeseg_tpu.ops.pallas.windows import window_apply

    out = window_apply(
        lambda tq, tk: _flood_packed(tq, tk, n_levels, label_bits=label_bits,
                                     interpret=interpret),
        (qs, key0), (sentinel, _BIG_KEY), tile=tile, halo=halo)
    labels = jnp.where(mask, out, 0)

    # fixed-point cleanup for basins reaching beyond the halo
    from microbeseg_tpu.ops.watershed import _SHIFTS_4, _flood_step

    def cond(state):
        _, changed, it = state
        return changed & (it < H * W)

    def body(state):
        labels, _, it = state
        new = _flood_step(labels, value, mask, _SHIFTS_4)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.array(True), jnp.int32(0)))
    return labels


def flood_or_fallback(value, markers, mask, n_levels: int = 128,
                      max_label: int = 4095):
    """Pallas flood for VMEM-sized images, tiled Pallas flood for larger
    frames, XLA flood otherwise.

    ``max_label``: static upper bound on marker ids.  The packed key
    carries labels in the low 12 bits on the hot crop path and 24 bits on
    the tiled/large-cap paths; ids beyond the static bound would overflow
    into the level bits and corrupt BOTH fields silently, so oversized
    configurations route to the XLA flood instead."""
    H, W = value.shape[-2], value.shape[-1]
    if max(H, W) <= MAX_VMEM_SIDE:
        # 12 bits: keys up to (n_levels-1)<<12 | 4095 stay below _BIG_KEY
        # for n_levels <= 2^19, the kernel's own packing bound.  24 bits:
        # the (127<<24)|0xFFFFFF corner EQUALS _BIG_KEY, hence the -1.
        if max_label < (1 << 12) and n_levels <= (1 << 19):
            return flood_pallas(value, markers, mask, n_levels=n_levels,
                                label_bits=12)
        if max_label < (1 << 24) - 1 and n_levels <= 128:
            return flood_pallas(value, markers, mask, n_levels=n_levels,
                                label_bits=24)
    elif max_label < (1 << 24) - 1 and n_levels <= 128:
        return flood_tiled(value, markers, mask, n_levels=n_levels)
    from microbeseg_tpu.ops.watershed import watershed
    return watershed(value, markers, mask, n_levels=n_levels)
