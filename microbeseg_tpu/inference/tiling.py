"""Sliding-window tiled inference with halo overlap and feathered stitching.

First-class implementation of the capability the reference only stubs
("sliding_window ... not implemented yet", reference:
src/inference/infer.py:60-61; GUI checkbox src/microbe_seg_gui.py:1581;
images beyond the 8192-px bucket table raise "Image too big to pad. Use
sliding windows", reference src/utils/utils.py:155).

Design (the spatial analog of context parallelism, SURVEY.md §5.7): the image
is cut into overlapping tiles; tiles are batched along the leading axis (and
sharded across TPU cores by the engine); the *continuous* network predictions
are stitched back with feathered (linear ramp) weights in the halo regions,
and instance extraction runs once on the stitched prediction maps — which
sidesteps cross-tile instance-ID reconciliation entirely and avoids seam
artifacts in the watershed.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tile_positions(size: int, tile: int, overlap: int) -> List[int]:
    """Start offsets covering [0, size) with `tile`-sized windows overlapping
    by >= `overlap` (the last tile is right-aligned)."""
    if tile >= size:
        return [0]
    stride = tile - overlap
    starts = list(range(0, size - tile, stride))
    starts.append(size - tile)
    return starts


def extract_tiles(img: np.ndarray, tile: int, overlap: int
                  ) -> Tuple[np.ndarray, List[Tuple[int, int]]]:
    """img (H, W) -> (n_tiles, tile, tile) plus (y, x) start positions.
    The image must be >= tile in both dims (pad smaller images instead)."""
    H, W = img.shape[:2]
    ys = tile_positions(H, tile, overlap)
    xs = tile_positions(W, tile, overlap)
    tiles, pos = [], []
    for y in ys:
        for x in xs:
            tiles.append(img[y:y + tile, x:x + tile])
            pos.append((y, x))
    return np.stack(tiles), pos


def _feather_weight(tile: int) -> np.ndarray:
    """2D feathering weight: linear ramp from the tile border inward."""
    ramp = np.minimum(np.arange(tile) + 1, np.arange(tile)[::-1] + 1)
    ramp = ramp.astype(np.float32)
    w = np.minimum.outer(ramp, ramp)
    return w / w.max()


def stitch_predictions(tiles: np.ndarray, pos: List[Tuple[int, int]],
                       out_shape: Tuple[int, int]) -> np.ndarray:
    """Blend (n, tile, tile) prediction tiles into (H, W) with feathered
    weights (normalized weighted average in overlaps).

    Host-side reference implementation (the device path below is tested
    against it); the engine stitches on device via
    ``stitch_predictions_batch``."""
    H, W = out_shape
    tile = tiles.shape[1]
    acc = np.zeros((H, W), np.float64)
    wacc = np.zeros((H, W), np.float64)
    w = _feather_weight(tile)
    for t, (y, x) in zip(tiles, pos):
        acc[y:y + tile, x:x + tile] += t.astype(np.float64) * w
        wacc[y:y + tile, x:x + tile] += w
    return (acc / np.maximum(wacc, 1e-12)).astype(np.float32)


@partial(jax.jit, static_argnames=("H", "W"))
def _stitch_device(tiles: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray,
                   weight: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Device stitching of a (B, n, tile, tile) tile batch into (B, H, W).

    lax.scan over tiles with dynamic-slice accumulate: tile placement is a
    ROW-GRANULAR update (contiguous rectangles), which is nearly free on TPU
    — unlike per-element scatters (CLAUDE.md gather ban).  The weight
    normalization field is identical for every image in the batch, so it is
    accumulated once, outside the vmap."""
    tile = weight.shape[0]

    def add_patch(acc, t_yx):
        t, y, x = t_yx
        patch = jax.lax.dynamic_slice(acc, (y, x), (tile, tile))
        return jax.lax.dynamic_update_slice(acc, patch + t, (y, x)), None

    def accumulate(per_tile):
        init = jnp.zeros((H, W), jnp.float32)
        acc, _ = jax.lax.scan(add_patch, init, (per_tile, ys, xs))
        return acc

    wacc = accumulate(jnp.broadcast_to(weight, (ys.shape[0], tile, tile)))
    acc = jax.vmap(accumulate)(tiles.astype(jnp.float32) * weight)
    return acc / jnp.maximum(wacc, 1e-12)


def stitch_tiles_device(tiles: jnp.ndarray,
                        pos: List[Tuple[int, int]],
                        out_shape: Tuple[int, int],
                        max_bytes: int = 1 << 29) -> jnp.ndarray:
    """Stitch a DEVICE-RESIDENT (B, n_tiles, tile, tile) batch into a
    device (B, H, W), chunking the batch so scan accumulators stay under
    ``max_bytes`` of HBM.  No host round-trips — the engine's tiled path
    goes tiles-up-once / mask-down-once (over the tunnel, transfers dominate
    large-image latency)."""
    H, W = out_shape
    B = tiles.shape[0]
    ys = jnp.asarray([p[0] for p in pos], jnp.int32)
    xs = jnp.asarray([p[1] for p in pos], jnp.int32)
    weight = jnp.asarray(_feather_weight(tiles.shape[2]))
    # accumulator footprint per image ~ H*W*4 B (plus the tile batch itself)
    per_img = H * W * 4 + tiles.shape[1] * tiles.shape[2] ** 2 * 4
    chunk = max(1, min(B, max_bytes // per_img))
    if chunk >= B:
        return _stitch_device(tiles, ys, xs, weight, H, W)
    out = []
    for s in range(0, B, chunk):
        n = min(chunk, B - s)
        block = tiles[s:s + chunk]
        if block.shape[0] < chunk:  # pad: one executable per (chunk, H, W)
            block = jnp.concatenate(
                [block, jnp.zeros((chunk - n,) + block.shape[1:],
                                  block.dtype)])
        out.append(_stitch_device(block, ys, xs, weight, H, W)[:n])
    return jnp.concatenate(out)


def stitch_predictions_batch(tiles: np.ndarray,
                             pos: List[Tuple[int, int]],
                             out_shape: Tuple[int, int],
                             max_bytes: int = 1 << 29) -> np.ndarray:
    """Host-array convenience wrapper around ``stitch_tiles_device``."""
    return np.asarray(stitch_tiles_device(jnp.asarray(tiles), pos,
                                          out_shape, max_bytes))
