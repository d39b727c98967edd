"""Training-data label generation on device.

TPU-native re-design of reference src/training/train_data_representations.py.
The reference loops over instances in Python, calling scipy EDT per instance
(SURVEY.md flags this as a hot CPU loop; reference :261-361).  Here the
per-instance work is a **vmapped window pipeline**:

  1. relabel instances to 1..n and take their centroids via segment-sum
     regionprops;
  2. vmap over instance slots: dynamic-slice a fixed (S, S) window around each
     centroid, compute the windowed cell EDT and neighbor EDT with a validity
     mask that reproduces the reference's clipped-crop semantics exactly;
  3. scatter-add the window contributions back with a short `lax.scan`.

Boundary/border/touching labels avoid the per-instance dilation loop entirely:
a pixel is "boundary" iff some 8-neighbor carries a different positive label —
one shifted-compare pass instead of n dilations (reference :75-126).

Static shapes: window size and instance capacity are bucketed so XLA compiles
a handful of variants per dataset.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from microbeseg_tpu.ops.cc import connected_components, relabel_sequential
from microbeseg_tpu.ops.edt import edt
from microbeseg_tpu.ops.morphology import (
    binary_closing,
    binary_dilation,
    binary_erosion,
    disk,
    generate_binary_structure,
    grey_closing,
)
from microbeseg_tpu.ops.regionprops import regionprops

_BIG_I = jnp.int32(2 ** 30)


# ---------------------------------------------------------------------------
# Shifted-compare boundary/border labels (vectorized over all instances)
# ---------------------------------------------------------------------------

def _neighbor_minmax_pos(label: jnp.ndarray, se: np.ndarray):
    """(min, max) positive label over the SE footprint at each pixel."""
    kh, kw = se.shape
    ph, pw = kh // 2, kw // 2
    H, W = label.shape
    lp = jnp.pad(label, ((ph, ph), (pw, pw)))
    mx = jnp.zeros_like(label)
    mn = jnp.full_like(label, _BIG_I)
    for dy in range(kh):
        for dx in range(kw):
            if not se[dy, dx]:
                continue
            v = lp[dy:dy + H, dx:dx + W]
            mx = jnp.maximum(mx, v)
            mn = jnp.minimum(mn, jnp.where(v > 0, v, _BIG_I))
    return mn, mx


@jax.jit
def boundary_mask(label: jnp.ndarray) -> jnp.ndarray:
    """Union over instances of (dilate(inst, 3x3) ^ inst): pixels with an
    8-neighbor carrying a different positive label."""
    se = np.ones((3, 3), dtype=bool)
    mn, mx = _neighbor_minmax_pos(label, se)
    has_pos = mx > 0
    differs = (mx != label) | ((mn != label) & (mn < _BIG_I))
    return has_pos & differs


@jax.jit
def boundary_label(label: jnp.ndarray) -> jnp.ndarray:
    """3-class label: 0 bg, 1 cell, 2 boundary (reference :75-99)."""
    label = label.astype(jnp.int32)
    b = boundary_mask(label)
    label_bin = label > 0
    return jnp.maximum(label_bin.astype(jnp.uint8),
                       2 * b.astype(jnp.uint8))


@jax.jit
def border_mask(label: jnp.ndarray) -> jnp.ndarray:
    """Touching borders only: boundary pixels *inside* instances
    (reference border_label :102-126: boundary ^ exterior-bg-ring)."""
    label = label.astype(jnp.int32)
    return boundary_mask(label) & (label > 0)


@jax.jit
def border_label(label: jnp.ndarray) -> jnp.ndarray:
    label = label.astype(jnp.int32)
    label_bin = label > 0
    return jnp.maximum(label_bin.astype(jnp.uint8),
                       2 * border_mask(label).astype(jnp.uint8))


@partial(jax.jit, static_argnames=("k_neighbors", "se_radius"))
def j4_label(label: jnp.ndarray, k_neighbors: int = 2,
             se_radius: int = 4) -> jnp.ndarray:
    """Pena J4 4-class label: 0 bg, 1 cell, 2 touching, 3 gap
    (reference :158-190).  The touching class needs only the predicate
    ">1 distinct instance in the (2k+1)^2 neighborhood", which reduces to
    min-positive != max-positive over the footprint (no O(HW) Python loop as
    in reference compute_neighbor_instances :193-217)."""
    label = label.astype(jnp.int32)
    label_bin = label > 0
    se_bh = disk(se_radius)
    bottom_hat = binary_closing(label_bin, se_bh) ^ label_bin

    k = 2 * k_neighbors + 1
    mn, mx = _neighbor_minmax_pos(label, np.ones((k, k), dtype=bool))
    multi = (mx > 0) & (mn < _BIG_I) & (mn != mx)

    bg = (~label_bin) & (~bottom_hat)
    gap = (~label_bin) & bottom_hat
    touching = label_bin & multi
    # cell = everything else; encoded 0..3 as in the reference (max stack - 1)
    out = jnp.maximum(bg.astype(jnp.int32) * 1, 2 * (~(bg | gap | touching)))
    out = jnp.maximum(out, 3 * touching)
    out = jnp.maximum(out, 4 * gap)
    return (out - 1).astype(jnp.uint8)


def _canny_edges(img: jnp.ndarray) -> jnp.ndarray:
    """cv2.Canny(img, 1, 1) on device: 3x3 Sobel with replicated borders,
    L1 gradient magnitude (cv2's L2gradient=False default), sector-quantized
    non-maximum suppression (tan 22.5/67.5 split like cv2's fixed-point
    comparison), threshold >= 1.  With low == high == 1 the hysteresis stage
    is the identity, so this IS the full Canny pipeline for the reference's
    piecewise-constant label inputs (reference train_data_representations
    .py:144-146)."""
    H, W = img.shape
    x = img.astype(jnp.float32)
    xp = jnp.pad(x, 1, mode="edge")

    def sh(dy, dx):
        return xp[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]

    gx = ((sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1))
          - (sh(-1, -1) + 2 * sh(0, -1) + sh(1, -1)))
    gy = ((sh(1, -1) + 2 * sh(1, 0) + sh(1, 1))
          - (sh(-1, -1) + 2 * sh(-1, 0) + sh(-1, 1)))
    mag = jnp.abs(gx) + jnp.abs(gy)
    magp = jnp.pad(mag, 1)

    def nb(dy, dx):
        return magp[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]

    ax, ay = jnp.abs(gx), jnp.abs(gy)
    tg22, tg67 = 0.41421356, 2.41421356
    horiz = ay <= tg22 * ax
    vert = ay > tg67 * ax
    same_sign = (gx * gy) >= 0
    keep = jnp.where(
        horiz, (mag > nb(0, -1)) & (mag >= nb(0, 1)),
        jnp.where(
            vert, (mag > nb(-1, 0)) & (mag >= nb(1, 0)),
            jnp.where(same_sign,
                      (mag > nb(-1, -1)) & (mag >= nb(1, 1)),
                      (mag > nb(-1, 1)) & (mag >= nb(1, -1)))))
    return (mag >= 1.0) & keep


@jax.jit
def adapted_border_label(label: jnp.ndarray) -> jnp.ndarray:
    """Adapted-border label (reference :129-155): Canny edges of the
    instance partition XOR Canny edges of the binary foreground leave only
    the touching borders; dilate/close those, erode the cells, combine.
    Edge detection is the on-device Canny above (the reference calls
    cv2.Canny with thresholds (1,1)); this legacy method is not used by the
    default distance pipeline."""
    label = label.astype(jnp.int32)
    label_bin = label > 0
    se = np.ones((3, 3), dtype=bool)
    boundary = _canny_edges(label)
    border = boundary ^ _canny_edges(label_bin.astype(jnp.int32))
    border_adapted = binary_dilation(border, se)
    cell_adapted = binary_erosion(label_bin, se)
    border_adapted = binary_closing(border_adapted, se)
    return jnp.maximum(cell_adapted.astype(jnp.uint8),
                       2 * border_adapted.astype(jnp.uint8))


# ---------------------------------------------------------------------------
# Distance labels: vmapped per-instance windows
# ---------------------------------------------------------------------------

def _window_bounds(cy, cx, radius, H, W, S):
    """Window start (clamped so the full (S,S) slice stays in bounds) plus the
    reference crop's valid-row/col masks in window coordinates."""
    cy = jnp.round(cy).astype(jnp.int32)
    cx = jnp.round(cx).astype(jnp.int32)
    sy = jnp.clip(cy - radius, 0, max(H - S, 0))
    sx = jnp.clip(cx - radius, 0, max(W - S, 0))
    rows = jnp.arange(S, dtype=jnp.int32)
    gy = sy + rows
    gx = sx + rows
    vy = (gy >= jnp.maximum(cy - radius, 0)) & (gy < jnp.minimum(cy + radius, H))
    vx = (gx >= jnp.maximum(cx - radius, 0)) & (gx < jnp.minimum(cx + radius, W))
    return sy, sx, vy, vx


def _one_instance(label, inst_id, cy, cx, radius, S, chunk):
    """Cell- and neighbor-distance window contributions for one instance."""
    H, W = label.shape
    sy, sx, vy, vx = _window_bounds(cy, cx, radius, H, W, S)
    win = jax.lax.dynamic_slice(label, (sy, sx), (S, S))
    valid = vy[:, None] & vx[None, :]
    # inst_id > 0 guard: absent vmap slots carry id 0, which would otherwise
    # match the background
    nucleus = (win == inst_id) & valid & (inst_id > 0)

    # cell distance (reference :289-298)
    d_cell = edt(nucleus, valid, chunk=chunk)
    max_dist = jnp.max(d_cell)
    cell = jnp.where(max_dist > 0, d_cell / jnp.maximum(max_dist, 1e-12), 0.0)

    # neighbor distance (reference :300-330): distance from this nucleus to
    # the nearest *other* instance within the crop
    other = (win > 0) & (win != inst_id) & valid
    has_neighbor = jnp.any(other)
    feat = ((win == 0) | (win == inst_id)) & valid
    d_nb = edt(feat, valid, chunk=chunk) * nucleus
    max_nb = jnp.max(d_nb)
    denom = jnp.minimum(max_dist + 3.0, max_nb)
    nb_scaled = jnp.clip(d_nb / jnp.maximum(denom, 1e-12), 0.0, 1.0)
    neighbor = (1.0 - nb_scaled) * nucleus
    neighbor = jnp.where(has_neighbor & (max_nb > 0) & (max_dist > 0),
                         neighbor, 0.0)
    return cell, neighbor, sy, sx


def _scatter_add(canvas, windows, sys_, sxs, S):
    """Sequentially add (n, S, S) windows at (sys_, sxs) into canvas."""
    def body(canvas, xs):
        w, sy, sx = xs
        cur = jax.lax.dynamic_slice(canvas, (sy, sx), (S, S))
        return jax.lax.dynamic_update_slice(canvas, cur + w, (sy, sx)), None

    canvas, _ = jax.lax.scan(body, canvas, (windows, sys_, sxs))
    return canvas


def _slot_chunk(n_slots: int, window: int) -> int:
    """Instance slots vmapped per scan step: caps the live per-instance
    window memory at ~32 MB per buffer so large capacity x large window
    combinations (2048 instances at 256^2 windows would be gigabytes if
    vmapped at once) stay bounded."""
    return max(1, min(n_slots, (8 << 20) // (window * window)))


def _chunk_slots(n_slots: int, window: int, *arrays):
    """Reshape (n_slots, ...) slot arrays to (n_chunks, chunk, ...) for a
    lax.scan over chunks, zero-padding the tail (id-0 slots are inert)."""
    c = _slot_chunk(n_slots, window)
    n_pad = (-n_slots) % c
    out = []
    for a in arrays:
        if n_pad:
            a = jnp.concatenate(
                [a, jnp.zeros((n_pad,) + a.shape[1:], a.dtype)])
        out.append(a.reshape(-1, c, *a.shape[1:]))
    return out


def _scan_scatter(one_fn, ids, cys, cxs, n_canvases, shape, window):
    """scan(vmap(one_fn) -> scatter-add) over instance chunks: only one
    chunk of (chunk, S, S) windows is ever live, instead of the full
    (capacity, S, S) stack."""
    ids_c, cys_c, cxs_c = _chunk_slots(ids.shape[0], window, ids, cys, cxs)

    def step(canvases, xs):
        i, y, x = xs
        outs = jax.vmap(one_fn)(i, y, x)
        wins, sy, sx = outs[:-2], outs[-2], outs[-1]
        canvases = tuple(_scatter_add(cv, w, sy, sx, window)
                         for cv, w in zip(canvases, wins))
        return canvases, None

    init = tuple(jnp.zeros(shape, jnp.float32) for _ in range(n_canvases))
    canvases, _ = jax.lax.scan(step, init, (ids_c, cys_c, cxs_c))
    return canvases


def _closing_canvas(label, ids, cys, cxs, radius, S, se):
    """OR of per-instance binary closings (reference bottom_hat_closing
    :48-55 applies disk(3) closing per nucleus before the bottom hat)."""
    H, W = label.shape

    def one(inst_id, cy, cx):
        sy, sx, vy, vx = _window_bounds(cy, cx, radius, H, W, S)
        win = jax.lax.dynamic_slice(label, (sy, sx), (S, S))
        nucleus = (win == inst_id) & (inst_id > 0)
        closed = binary_closing(nucleus, se)
        return closed.astype(jnp.float32), sy, sx

    (canvas,) = _scan_scatter(one, ids, cys, cxs, 1, (H, W), S)
    return canvas > 0


def _gap_ring_sums(gaps: jnp.ndarray, label_nb: jnp.ndarray,
                   max_gaps: int) -> jnp.ndarray:
    """Per-gap boundary sum: Σ label_nb over each gap's 8-connected ring
    (pixels adjacent to the gap but not in it), slots 1..max_gaps.

    Two regimes, switched like the seed-prune histogram
    (ops/postprocessing.py): a per-gap vmap is measured-free at crop-scale
    capacities but materializes (max_gaps, H, W) intermediates — ~13 GB at
    a 2048^2 frame with 3072 gap slots — so above 256 slots the sums run
    linear in pixels: each pixel finds its <=8 DISTINCT neighboring gap
    ids by shift comparison (dedup across shifts keeps a pixel counted
    once per gap, matching the ring semantics) and scatter-adds its
    label_nb into each."""
    if max_gaps <= 256:
        se_ring = np.ones((3, 3), dtype=bool)

        def gap_fields(g):
            region = gaps == g
            ring = binary_dilation(region, se_ring) ^ region
            return jnp.sum(ring * label_nb)

        gids = jnp.arange(1, max_gaps + 1, dtype=jnp.int32)
        return jax.vmap(gap_fields)(gids)

    H, W = gaps.shape
    padded = jnp.pad(gaps, 1)
    shifted = [padded[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
               for dy in (-1, 0, 1) for dx in (-1, 0, 1)
               if (dy, dx) != (0, 0)]
    total = jnp.zeros(max_gaps + 1, jnp.float32)
    for k, s in enumerate(shifted):
        contrib = (s > 0) & (s <= max_gaps) & (s != gaps)
        for j in range(k):  # dedup: count each (pixel, gap) pair once
            contrib &= shifted[j] != s
        total = total.at[jnp.where(contrib, s, 0)].add(
            jnp.where(contrib, label_nb, 0.0))
    return total[1:]


@partial(jax.jit, static_argnames=("max_instances", "window", "max_gaps", "chunk"))
def distance_label_device(label: jnp.ndarray, radius: jnp.ndarray,
                          max_instances: int = 128, window: int = 64,
                          max_gaps: int = 64, chunk: int = 8):
    """Cell-distance + neighbor-distance labels (reference distance_label
    :261-361).  `label` int32 (H, W) with ids 1..n (relabeled), `radius` the
    search radius (traced; window is the static slice size >= 2*radius)."""
    H, W = label.shape
    label = label.astype(jnp.int32)
    props = regionprops(label, max_labels=max_instances)
    ids = jnp.arange(1, max_instances + 1, dtype=jnp.int32)
    present = props.area > 0
    # absent slots: point the window at (0, 0) with id 0 => zero contribution
    ids = jnp.where(present, ids, 0)
    cys = jnp.where(present, props.centroid[:, 0], 0.0)
    cxs = jnp.where(present, props.centroid[:, 1], 0.0)

    label_dist, label_nb = _scan_scatter(
        lambda i, y, x: _one_instance(label, i, y, x, radius, window, chunk),
        ids, cys, cxs, 2, (H, W), window)

    # --- gap handling via bottom-hat closing (reference :332-354) ---
    se3 = disk(3)
    label_bin = _closing_canvas(label, ids, cys, cxs, radius, window, se3)
    bottom_hat = binary_closing(label_bin, se3) ^ label_bin
    gaps = relabel_sequential(connected_components(bottom_hat),
                              max_labels=max_gaps)
    gprops = regionprops(gaps, max_labels=max_gaps)

    ring_sums = _gap_ring_sums(gaps, label_nb, max_gaps)

    areas = gprops.area
    th = jnp.where(areas <= 20, 5.0,
                   jnp.where(areas <= 30, 8.0,
                             jnp.where(areas <= 50, 10.0, 20.0)))
    keep = (areas > 0) & (ring_sums >= th)          # artifact filter :337-350
    thick = gprops.minor_axis_length >= 3.0         # gap-integration :66-70

    # base corr: 1.0 on kept gap pixels.  relabel_sequential preserves ids
    # beyond max_gaps (cc.py contract) — those overflow gaps have no
    # keep/thick slot, so they are treated as filtered artifacts rather
    # than aliased onto slot max_gaps-1 by the clip.
    in_range = (gaps > 0) & (gaps <= max_gaps)
    gap_keep = keep[jnp.clip(gaps - 1, 0, max_gaps - 1)] & in_range
    gap_thick = thick[jnp.clip(gaps - 1, 0, max_gaps - 1)] & in_range
    corr = gap_keep.astype(jnp.float32)
    # thick gaps: interior 1.0, 1-px inner border 0.8 (reference :65-70)
    cross = generate_binary_structure(2, 1)
    interior = binary_erosion(gaps > 0, cross) & (gaps > 0)
    gap_border = (gaps > 0) & ~interior
    corr = jnp.where(gap_thick & gap_keep,
                     jnp.where(gap_border, 0.8, 1.0), corr)

    label_border_m = border_mask(label)
    label_nb = jnp.maximum(label_nb, corr)
    label_nb = jnp.maximum(label_nb, label_border_m.astype(jnp.float32))

    # nonlinear rescale + grey closing (reference :357-359)
    label_nb = 1.0 / jnp.sqrt(0.65 + 0.5 * jnp.exp(-11.0 * (label_nb - 0.75))) - 0.19
    label_nb = jnp.clip(label_nb, 0.0, 1.0)
    label_nb = grey_closing(label_nb, size=(3, 3))

    return label_dist.astype(jnp.float32), label_nb.astype(jnp.float32)


@partial(jax.jit, static_argnames=("max_instances", "window", "chunk",
                                   "apply_clipping"))
def cell_distance_label_device(label: jnp.ndarray, radius: jnp.ndarray,
                               max_instances: int = 128, window: int = 64,
                               chunk: int = 8, apply_clipping: bool = False,
                               clip_val: float = 5.0):
    """Cell-distance-only label (reference cell_distance_label :220-258)."""
    H, W = label.shape
    label = label.astype(jnp.int32)
    props = regionprops(label, max_labels=max_instances)
    ids = jnp.arange(1, max_instances + 1, dtype=jnp.int32)
    present = props.area > 0
    ids = jnp.where(present, ids, 0)
    cys = jnp.where(present, props.centroid[:, 0], 0.0)
    cxs = jnp.where(present, props.centroid[:, 1], 0.0)

    def one(inst_id, cy, cx):
        sy, sx, vy, vx = _window_bounds(cy, cx, radius, H, W, window)
        win = jax.lax.dynamic_slice(label, (sy, sx), (window, window))
        valid = vy[:, None] & vx[None, :]
        nucleus = (win == inst_id) & valid & (inst_id > 0)
        d = edt(nucleus, valid, chunk=chunk)
        if not apply_clipping:
            m = jnp.max(d)
            d = jnp.where(m > 0, d / jnp.maximum(m, 1e-12), d)
        return d, sy, sx

    (out,) = _scan_scatter(one, ids, cys, cxs, 1, (H, W), window)
    if apply_clipping:
        out = jnp.clip(out, 0.0, clip_val) / clip_val
    return out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Host-facing dispatch (reference get_label :11-37)
# ---------------------------------------------------------------------------

def _bucket(n: int, buckets=(16, 32, 48, 64, 96, 128, 192, 256, 384, 512,
                             768, 1024, 1536, 2048, 3072, 4096, 6144,
                             8192)) -> int:
    """Smallest bucket >= n (saturating at the top).  Buckets extend to
    8192 so neither the per-instance capacity (a 2048^2 frame can hold
    thousands of cells) nor the window size (radius beyond 256) silently
    saturates — instances past the cap would get ZERO labels and windows
    smaller than 2*radius are truncated/mis-centered."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def max_major_axis_length(mask: np.ndarray) -> int:
    """ceil(max major axis) over instances (reference train.py:74-79)."""
    dense, n = _dense_relabel(mask)
    if not n:
        return 0
    props = regionprops(jnp.asarray(dense), max_labels=_bucket(n + 1))
    mal = np.asarray(props.major_axis_length)
    return int(np.ceil(mal.max()))


def _dense_relabel(mask: np.ndarray) -> Tuple[np.ndarray, int]:
    ids = np.unique(mask)
    ids = ids[ids > 0]
    dense = np.searchsorted(ids, mask) + 1
    dense = np.where(mask > 0, dense, 0).astype(np.int32)
    return dense, len(ids)


def get_label(mask: np.ndarray, label_type: str, max_mal: int = 0):
    """Label-generation dispatch, host entry point.

    Returns numpy arrays; for 'distance' a (cell_dist, neighbor_dist) tuple
    (reference get_label :11-37).
    """
    mask = np.asarray(mask)
    if label_type == "boundary":
        return np.asarray(boundary_label(jnp.asarray(mask.astype(np.int32))))
    if label_type == "border":
        return np.asarray(border_label(jnp.asarray(mask.astype(np.int32))))
    if label_type == "adapted_border":
        return np.asarray(adapted_border_label(jnp.asarray(mask.astype(np.int32))))
    if label_type == "j4":
        return np.asarray(j4_label(jnp.asarray(mask.astype(np.int32))))

    dense, n = _dense_relabel(mask)
    if n + 1 > 8192:
        # _bucket saturates at its top entry; past it, instances would get
        # silently ZERO labels — fail loudly instead
        raise ValueError(
            f"{n} instances exceed the 8192-instance label-generation "
            f"capacity; split the frame into crops")
    radius = int(np.ceil(0.75 * max_mal))
    H, W = mask.shape
    # the (S, S) window must satisfy S >= 2*radius or the per-instance
    # slice is truncated AND mis-centered (the clamped start can exclude
    # the centroid on non-square images).  Rather than shrinking the
    # window to min(H, W), pad the canvas up to the window size; the
    # absurd-radius saturation case (> top bucket) clamps radius instead.
    window = _bucket(max(2 * radius, 8))
    radius = min(radius, window // 2)
    Hp, Wp = max(H, window), max(W, window)
    if (Hp, Wp) != (H, W):
        dense = np.pad(dense, ((0, Hp - H), (0, Wp - W)))
    cap = max(_bucket(n + 1), 16)
    if label_type in ("cell_dist", "cell_dist_clipped"):
        out = cell_distance_label_device(
            jnp.asarray(dense), jnp.int32(radius), max_instances=cap,
            window=window, apply_clipping=(label_type == "cell_dist_clipped"))
        return np.asarray(out[:H, :W])
    if label_type == "distance":
        cell, nb = distance_label_device(
            jnp.asarray(dense), jnp.int32(radius), max_instances=cap,
            window=window, max_gaps=max(cap, 64))
        return np.asarray(cell[:H, :W]), np.asarray(nb[:H, :W])
    raise ValueError(f"Label type not known: {label_type!r}")
