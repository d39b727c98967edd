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

from typing import List, Tuple

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
    weights (normalized weighted average in overlaps)."""
    H, W = out_shape
    tile = tiles.shape[1]
    acc = np.zeros((H, W), np.float64)
    wacc = np.zeros((H, W), np.float64)
    w = _feather_weight(tile)
    for t, (y, x) in zip(tiles, pos):
        acc[y:y + tile, x:x + tile] += t.astype(np.float64) * w
        wacc[y:y + tile, x:x + tile] += w
    return (acc / np.maximum(wacc, 1e-12)).astype(np.float32)
