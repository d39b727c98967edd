"""Host-side image utilities: normalization, bucket padding, border correction.

Behavioral parity targets: reference src/utils/utils.py (min_max_normalization
:50-74, zero_pad_model_input :124-163, border_correction :25-47,
get_nucleus_ids :11-22, unique_path :77-91).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from microbeseg_tpu.config import PAD_BUCKETS


def get_nucleus_ids(img: np.ndarray) -> np.ndarray:
    """Instance ids (> 0) present in an intensity-coded label image."""
    values = np.unique(img)
    return values[values > 0]


def min_max_normalization(img: np.ndarray,
                          min_value: Optional[float] = None,
                          max_value: Optional[float] = None) -> np.ndarray:
    """Clip to [min, max] then scale to [-1, 1] (float32)."""
    if max_value is None:
        max_value = img.max()
    if min_value is None:
        min_value = img.min()
    img = np.clip(img, min_value, max_value)
    denom = float(max_value) - float(min_value)
    if denom == 0:
        return np.zeros_like(img, dtype=np.float32)
    img = 2.0 * (img.astype(np.float32) - min_value) / denom - 1.0
    return img.astype(np.float32)


def pad_bucket_shape(h: int, w: int) -> Tuple[int, int]:
    """Smallest tested bucket shape covering (h, w).

    Raises if either side exceeds the largest bucket — callers should switch to
    tiled inference then (`microbeseg_tpu.inference.tiling`), which the
    reference only stubs ("Image too big to pad. Use sliding windows",
    reference: src/utils/utils.py:155).
    """
    out = []
    for s in (h, w):
        for b in PAD_BUCKETS:
            if s <= b:
                out.append(b)
                break
        else:
            raise ValueError(
                f"side {s} exceeds the largest pad bucket {PAD_BUCKETS[-1]}; "
                "use tiled inference (InferConfig.use_tiling=True)")
    return out[0], out[1]


def zero_pad_model_input(img: np.ndarray, pad_val: float = 0) -> Tuple[np.ndarray, List[int]]:
    """Pad up-left to the next bucket shape; returns (padded, [pad_y, pad_x]).

    Matches reference 2D semantics: pads are prepended (up/left), so the
    original image sits at the bottom-right of the padded frame and is
    recovered with ``padded[..., pad_y:, pad_x:]``.  Deviation from the
    reference for stacks: a (T, H, W) stack pads H and W directly and returns
    ``[pad_y, pad_x]`` in the same order as 2D (the reference transposes
    through (W, H, T) and returns (pad_x, pad_y); reference:
    src/utils/utils.py:140-159 — an inconsistency its own per-frame loops
    never hit).
    """
    if img.ndim == 3:  # (T, H, W): time/z needs no pads
        th, tw = pad_bucket_shape(img.shape[1], img.shape[2])
        pads = [th - img.shape[1], tw - img.shape[2]]
        img = np.pad(img, ((0, 0), (pads[0], 0), (pads[1], 0)),
                     mode="constant", constant_values=pad_val)
        return img, pads
    th, tw = pad_bucket_shape(img.shape[0], img.shape[1])
    pads = [th - img.shape[0], tw - img.shape[1]]
    img = np.pad(img, ((pads[0], 0), (pads[1], 0)),
                 mode="constant", constant_values=pad_val)
    return img, pads


def border_correction(mask: np.ndarray, border_width: int = 10) -> np.ndarray:
    """Drop instances absent from the inset field of interest before scoring."""
    mask = np.asarray(mask)
    foi = mask[border_width:mask.shape[0] - border_width,
               border_width:mask.shape[1] - border_width]
    keep = np.unique(foi)
    # Vectorized: zero out ids not present in the field of interest.
    out = np.where(np.isin(mask, keep), mask, 0)
    return out.astype(mask.dtype)


def unique_path(directory: Path, name_pattern: str) -> Path:
    """First non-existing ``directory / name_pattern.format(counter)``."""
    counter = 0
    while True:
        counter += 1
        path = Path(directory) / name_pattern.format(counter)
        if not path.exists():
            return path
