"""Instance extraction from CNN predictions, fully on device.

TPU-native re-design of reference src/inference/postprocessing.py
(distance_postprocessing :7-59, boundary_postprocessing :62-90): gaussian
smoothing, seed thresholding, connected components, small-seed pruning by
mean-area statistics, and marker-based watershed — composed into one jit so a
predicted crop goes raw logits -> uint16 instance mask without host
round-trips, and vmaps over the evaluation threshold grid
(reference eval.py:127-131 runs 8 sequential CPU watersheds instead).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from microbeseg_tpu.ops.cc import connected_components, sequentialize_components
from microbeseg_tpu.ops.filters import gaussian_filter
from microbeseg_tpu.ops.watershed import watershed, watershed_fast


def _prune_radix(rank: jnp.ndarray, cap: int, min_area_floor: float,
                 rel_mean: float, out_cap: int = None) -> jnp.ndarray:
    """Area histogram + compacting remap for large id capacities, MXU-only.

    Built on ``ops/radix.py`` (id = hi*256 + lo decomposition: histogram
    and table lookup as pixel-chunked matmuls; replaced per-element
    scatter-add/gather traffic measured at ~66 ms/2048^2, ~280 ms/4096^2).
    All selections are exact: one-hot rows are 0/1, per-pixel products
    pick a single table entry, and new ids (< 2^24) are exact in f32.

    ``out_cap``: survivors compacted beyond this id are dropped (the
    static label capacity of the downstream flood); None keeps all.
    """
    from microbeseg_tpu.ops.radix import radix_histogram, radix_lookup

    areas = radix_histogram(rank, cap)
    areas = areas.at[0].set(0.0)
    n = jnp.sum(areas > 0)
    mean_area = jnp.sum(areas) / jnp.maximum(n, 1)
    min_area = jnp.where(n > 0, rel_mean * mean_area, 0.0)
    min_area = jnp.maximum(min_area, min_area_floor)
    kept = areas > min_area
    table = jnp.cumsum(kept.astype(jnp.int32)) * kept
    if out_cap is not None:
        table = jnp.where(table > out_cap, 0, table)
    return radix_lookup(rank, table.astype(jnp.float32)).astype(jnp.int32)


def _prune_small_seeds(seeds_bin: jnp.ndarray, min_area_floor: float,
                       rel_mean: float, max_seeds: int = 256) -> jnp.ndarray:
    """Label seed components sequentially and drop those with area <=
    max(rel_mean * mean_area, floor).

    TPU-native path: CC ids are sequentialized gather-free (root rank
    flooding), then component areas, the prune decision, AND the compact
    renumbering ride the radix-matmul histogram/lookup of ``ops/radix.py``
    on the MXU — per-element scatter/gather histograms cost ~0.4 ms per
    65K elements on this hardware (scripts/microbench_gather.py) while
    these matmuls are MXU-pad-bound and ~free at crop sizes.  Because the
    surviving ids come out compacted to 1..n, the watershed output needs
    no relabel pass afterwards.

    SURVIVORS compacted beyond ``max_seeds`` are dropped (the downstream
    flood's static label capacity; the engine scales it with frame area).
    The AREA pass itself runs with ``raw_cap`` = 4x headroom (min 1024):
    speckle components commonly outnumber real seeds on noisy fields, and
    the earlier design capped the RAW raster-order component ranks at
    ``max_seeds`` before the area prune, silently deleting real cells
    whose rank fell beyond the cap (round-5 on-chip boundary-gate
    incident: 328 raw components at cap 256 dropped 4 of 12 true seeds).
    The reference never rank-caps — it prunes by area over ALL components
    (postprocessing.py:33-38, :81-85), and the mean-area term therefore
    also includes speckle, which this matches.  Raw components beyond
    raw_cap would still drop silently — at default that needs one
    component per 64 px, a field with no usable segmentation anyway.
    """
    rank = sequentialize_components(connected_components(seeds_bin))
    cap = max_seeds
    raw_cap = min(max(4 * cap, 1024), (1 << 24) - 1)
    rank = jnp.where(rank > raw_cap, 0, rank)

    # Large caps (area-scaled full-frame post-processing): a single one-hot
    # would be O(pixels * cap) VPU compares — at 2048^2 with a 16K cap that
    # is ~70 G element-ops (~11 s/frame measured).  The round-3 scatter-add
    # histogram + table-gather remap was linear in pixels but still paid
    # ~0.4 ms per 65K elements of per-element gather/scatter traffic
    # (scripts/microbench_gather.py) — 66 ms at 2048^2 / ~280 ms at 4096^2,
    # the largest single stage of full-frame post-processing.  The radix
    # decomposition below (id = hi*256 + lo) keeps everything on the MXU:
    # construction is O(pixels * (256 + cap/256)) compares and both the
    # histogram and the remap become pixel-chunked matmuls.  Measured at
    # 2048^2 cap 16384: 66 -> 8 ms (bit-identical outputs, tested).  The
    # raw_cap headroom routes every call here (raw_cap >= 1024): radix
    # cost is MXU-pad-bound at P x 256 x 128 regardless of cap
    # (E2E_RESULTS radix ceiling analysis), ~tens of us at 256^2.
    return _prune_radix(rank, raw_cap, min_area_floor, rel_mean,
                        out_cap=cap)


@partial(jax.jit, static_argnames=("max_seeds", "n_levels", "method"))
def distance_postprocessing(border_prediction: jnp.ndarray,
                            cell_prediction: jnp.ndarray,
                            th_seed, th_cell,
                            max_seeds: int = 256,
                            n_levels: int = 128,
                            method: str = "auto") -> jnp.ndarray:
    """Distance-method post-processing (reference :7-59).

    border_prediction / cell_prediction: float (H, W).  th_seed / th_cell may
    be traced scalars (the eval grid vmaps over them).  Returns uint16
    instance mask.  method: 'auto' = the packed-key Pallas in-VMEM flood on
    TPU-class backends when the image fits VMEM (measured 1.9x the XLA
    flood), XLA flood otherwise; 'flood' = XLA quantized priority flood
    (closest to skimage semantics); 'pallas' = force the VMEM kernel;
    'fast' = drainage labeling + flood cleanup (prefer on CPU).
    """
    if method == "auto":
        # the packed key carries labels in 12 bits on the crop path and 24
        # on the tiled/large-cap paths; flood_or_fallback routes by size
        method = ("pallas" if max_seeds < (1 << 24) - 1
                  and jax.default_backend() != "cpu"
                  else "flood")
    cell = gaussian_filter(cell_prediction.astype(jnp.float32), sigma=0.5)
    border = jnp.clip(border_prediction.astype(jnp.float32), 0.0, 1.0)

    mask = cell > th_cell

    borders = jnp.tan(border * border)
    borders = jnp.where(borders < 0.05, 0.0, borders)
    borders = jnp.clip(borders, 0.0, 1.0)
    seeds_bin = (cell - borders) > th_seed

    # seeds come out pruned AND compacted to 1..n, so the flooded labels
    # are already sequential — no relabel pass after the watershed
    seeds = _prune_small_seeds(seeds_bin, min_area_floor=4.0, rel_mean=0.10,
                               max_seeds=max_seeds)

    if method == "fast":
        labels = watershed_fast(-cell, seeds, mask)
    elif method == "pallas":
        from microbeseg_tpu.ops.pallas.flood import flood_or_fallback
        if max_seeds >= (1 << 24) - 1:
            # the packed key carries labels in <= 24 bits — a forced
            # 'pallas' with a larger cap would silently corrupt both fields
            raise ValueError(
                f"method='pallas' supports max_seeds < 2^24-1, got "
                f"{max_seeds} (use method='auto'/'flood')")
        labels = flood_or_fallback(-cell, seeds, mask, n_levels=n_levels,
                                   max_label=max_seeds)
    else:
        labels = watershed(-cell, seeds, mask, n_levels=n_levels)
    return labels.astype(jnp.uint16)


@partial(jax.jit, static_argnames=("max_seeds",))
def boundary_postprocessing(prediction: jnp.ndarray,
                            max_seeds: int = 256) -> jnp.ndarray:
    """Boundary-method post-processing (reference :62-90).

    prediction: float (H, W, 3) softmax probabilities (bg, cell, boundary).
    """
    pred_bin = jnp.argmax(prediction, axis=-1)
    mask = pred_bin == 1

    seeds_bin = (prediction[..., 1] * (1.0 - prediction[..., 2])) > 0.5
    # reference postprocessing.py:81-85 removes seeds with area <= 4
    # (floor 4.0 here keeps areas > 4, exactly the reference's loop)
    seeds = _prune_small_seeds(seeds_bin, min_area_floor=4.0, rel_mean=0.0,
                               max_seeds=max_seeds)

    # same flood dispatch as the distance method: Pallas in-VMEM kernel on
    # TPU-class backends (tiled beyond the VMEM side), XLA flood otherwise
    if max_seeds < (1 << 24) - 1 and jax.default_backend() != "cpu":
        from microbeseg_tpu.ops.pallas.flood import flood_or_fallback
        labels = flood_or_fallback(-mask.astype(jnp.float32), seeds, mask,
                                   n_levels=2, max_label=max_seeds)
    else:
        labels = watershed(-mask.astype(jnp.float32), seeds, mask, n_levels=2)
    return labels.astype(jnp.uint16)


def distance_postprocessing_grid(border_prediction: jnp.ndarray,
                                 cell_prediction: jnp.ndarray,
                                 th_pairs: jnp.ndarray,
                                 max_seeds: int = 256,
                                 n_levels: int = 128) -> jnp.ndarray:
    """Vmapped threshold grid: th_pairs (n, 2) of (th_cell, th_seed) ->
    (n, H, W) uint16 masks, all thresholds flooded in parallel on device
    (replaces the 8 sequential CPU watersheds of reference eval.py:397-422).

    Frames beyond the VMEM side limit map sequentially instead: the tiled
    flood / warm-start kernels put windows on the pallas grid and a
    vmapped grid axis multiplies into it past Mosaic's scoped-VMEM
    tolerance (engine._post_fn has the measurement)."""
    post = lambda th: distance_postprocessing(  # noqa: E731
        border_prediction, cell_prediction, th[1], th[0],
        max_seeds=max_seeds, n_levels=n_levels)
    from microbeseg_tpu.ops.pallas.flood import MAX_VMEM_SIDE
    if max(cell_prediction.shape[-2:]) > MAX_VMEM_SIDE:
        return jax.lax.map(post, jnp.asarray(th_pairs))
    return jax.vmap(post)(jnp.asarray(th_pairs))
