"""Connected-component labeling on device.

TPU-native replacement for ``skimage.measure.label`` (reference:
src/inference/postprocessing.py:38,54,85; src/evaluation/eval.py:261).
Algorithm: each masked pixel starts with its linear index + 1; iterate
  (a) one 3x3 (or cross) neighborhood max propagation, then
  (b) two pointer-jump steps ``label[p] <- label[label[p]-1]``
to a fixed point.  Pointer jumping gives union-find-style path compression, so
convergence is O(log diameter) outer iterations instead of O(diameter) — the
difference between ~10 and ~600 sweeps on a 320^2 image with snaking regions.

Labels at the fixed point are per-component maxima of linear indices
(arbitrary but deterministic); use ``relabel_sequential`` for compact ids.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from microbeseg_tpu.ops.morphology import (
    _select_window,
    generate_binary_structure,
)


def _use_windowed_warmstart(H: int, W: int) -> bool:
    """Frames beyond 2048 px on TPU-class backends warm-start propagation
    loops with window-local VMEM sweeps (pallas/propagate.py); the CPU
    backend and smaller frames keep the plain XLA loop.  Crossover
    measured on chip: at 2048^2 the XLA sweeps already converge in a few
    ms (cc 2.0 / rank 2.6) and the warm start only adds carve/paste
    overhead (+1.2 ms); at 4096^2 the XLA sweeps blow up superlinearly
    (cc 36 / rank 70 ms) and the warm start wins 4-5x."""
    return max(H, W) > 2048 and jax.default_backend() != "cpu"


def _neighbor_max(labels: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    # one shared shifted-slice reduction (morphology._select_window) for
    # all window helpers; the extra maximum keeps the pixel's own label
    # even for SEs without a center
    return jnp.maximum(labels, _select_window(labels, se, jnp.maximum, 0))


@partial(jax.jit, static_argnames=("connectivity", "max_iters",
                                   "pointer_jumping", "steps_per_check"))
def connected_components(mask: jnp.ndarray, connectivity: int = 2,
                         max_iters: int = 0,
                         pointer_jumping: bool = False,
                         steps_per_check: int = 4) -> jnp.ndarray:
    """Label connected regions of a boolean mask.

    connectivity: 2 = 8-connected (skimage.measure.label default for 2D),
    1 = 4-connected.  Returns int32 (H, W), 0 for background, arbitrary
    positive ids per component.

    TPU note: plain neighbor-max propagation converges in O(component
    diameter) sweeps of cheap VPU work; the pointer-jumping variant converges
    in O(log diameter) but each jump is a full-image gather, which costs
    ~milliseconds on TPU (measured 9+ ms/crop at 256^2) vs microseconds for
    the sweeps — so jumping is off by default and propagation runs
    ``steps_per_check`` sweeps between convergence reductions.
    max_iters: 0 -> H * W, the true geodesic-diameter bound — curved /
    filamentous components (common in microbe imagery) have geodesic length
    well beyond H + W, and an undershot bound silently splits them.  The
    early-exit convergence check makes the larger bound nearly free: the
    loop stops ``steps_per_check`` sweeps after the fixed point regardless.
    """
    mask = mask.astype(bool)
    H, W = mask.shape
    if max_iters == 0:
        max_iters = H * W
    se = generate_binary_structure(2, connectivity)
    idx = (jnp.arange(H * W, dtype=jnp.int32) + 1).reshape(H, W)
    labels0 = jnp.where(mask, idx, 0)

    if _use_windowed_warmstart(H, W) and connectivity == 2:
        # big frames: run the same sweeps window-local in VMEM first (each
        # XLA sweep below is a full-frame HBM pass — 36 ms at 4096^2).
        # Monotone max-propagation has a unique fixed point, so the warm
        # start is exactly equivalence-preserving; components whose
        # geodesic diameter exceeds the halo just leave more work for the
        # global loop.
        from microbeseg_tpu.ops.pallas.propagate import cc_warmstart
        labels0 = cc_warmstart(labels0)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        new = labels
        for _ in range(steps_per_check):
            new = jnp.where(mask, _neighbor_max(new, se), 0)
        if pointer_jumping:
            flat = new.reshape(-1)
            for _ in range(2):
                target = jnp.maximum(flat - 1, 0)
                jumped = flat[target]
                flat = jnp.where(flat > 0, jnp.maximum(flat, jumped), 0)
            new = flat.reshape(H, W)
        return new, jnp.any(new != labels), it + steps_per_check

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.array(True), jnp.int32(0)))
    return labels


@partial(jax.jit, static_argnames=("steps_per_check", "max_iters",
                                   "isolated_components"))
def sequentialize_components(labels: jnp.ndarray, max_iters: int = 0,
                             steps_per_check: int = 4,
                             isolated_components: bool = True) -> jnp.ndarray:
    """Map CC propagation ids to sequential ranks 1..n, gather/scatter-free.

    ``connected_components`` labels each component with the max linear pixel
    index + 1, so the pixel holding that index (the "root") is identified
    elementwise; roots are ranked with one prefix sum and the rank is flooded
    back over each component by neighbor-max propagation gated on equal
    source ids.  Replaces the scatter+gather of ``relabel_sequential`` on the
    inference hot path (each costs ~0.4 ms per 65K elements on TPU —
    scripts/microbench_gather.py — vs cheap VPU sweeps here).

    Convergence is O(component geodesic diameter) sweeps — the default
    ``max_iters`` bound is H * W so snaking components converge too; the
    early-exit check stops the loop right after the fixed point, so blob-like
    seeds still cost only a handful of sweeps.
    """
    labels = labels.astype(jnp.int32)
    H, W = labels.shape
    if max_iters == 0:
        max_iters = H * W
    idx = (jnp.arange(H * W, dtype=jnp.int32) + 1).reshape(H, W)
    mask = labels > 0
    roots = (labels == idx) & mask
    seq = jnp.cumsum(roots.reshape(-1).astype(jnp.int32)).reshape(H, W)
    rank0 = jnp.where(roots, seq, 0)

    if isolated_components and _use_windowed_warmstart(H, W):
        # same warm-start argument as connected_components: the rank flood
        # is a gated monotone max-propagation with a unique fixed point
        # (70 ms of full-frame HBM sweeps at 4096^2 before this).  The
        # windowed kernel spreads ranks UNGATED, which is only equivalent
        # when distinct ids are never 8-adjacent — true for ids produced
        # by connected_components at connectivity 2 (maximal components).
        # ``isolated_components=False`` (e.g. 4-connected CC ids, where
        # separate components can touch diagonally) skips the warm start;
        # the gated XLA loop below owns the general semantics either way.
        from microbeseg_tpu.ops.pallas.propagate import rank_warmstart
        rank0 = rank_warmstart(labels, rank0)

    def spread(r):
        rp = jnp.pad(r, 1)
        lp = jnp.pad(labels, 1)
        out = r
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                if dy == 1 and dx == 1:
                    continue
                nr = rp[dy:dy + H, dx:dx + W]
                nl = lp[dy:dy + H, dx:dx + W]
                out = jnp.maximum(out, jnp.where(nl == labels, nr, 0))
        return jnp.where(mask, out, 0)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        r, _, it = state
        new = r
        for _ in range(steps_per_check):
            new = spread(new)
        return new, jnp.any(new != r), it + steps_per_check

    rank, _, _ = jax.lax.while_loop(
        cond, body, (rank0, jnp.array(True), jnp.int32(0)))
    return rank


@partial(jax.jit, static_argnames=("max_labels", "id_bound"))
def relabel_sequential(labels: jnp.ndarray, max_labels: int = 256,
                       id_bound: int = 0) -> jnp.ndarray:
    """Map arbitrary positive ids to 1..n (0 stays 0), sort-free.

    A presence scatter + prefix sum replaces ``jnp.unique`` — TPU sorts cost
    milliseconds at 256^2 while scatter/cumsum/gather are microseconds.  Ids
    must be bounded by ``id_bound`` (default: the CC convention of linear
    pixel indices, bound H*W).  ``max_labels`` is kept for call-site
    compatibility (capacity of downstream segment reductions); ids beyond it
    are preserved — callers bound instance counts structurally.
    """
    labels = labels.astype(jnp.int32)
    # default bound covers CC linear-index ids (<= size) and uint16 mask ids
    bound = id_bound if id_bound else max(labels.size, 65535)
    flat = labels.reshape(-1)
    present = jnp.zeros((bound + 1,), jnp.int32).at[
        jnp.clip(flat, 0, bound)].set(1)
    present = present.at[0].set(0)
    ranks = jnp.cumsum(present)  # ranks[v] = compact id of value v
    out = jnp.where(flat > 0, ranks[jnp.clip(flat, 0, bound)], 0)
    return out.reshape(labels.shape)


def num_labels(labels: jnp.ndarray) -> jnp.ndarray:
    """Count distinct positive ids (bounded by the relabel id convention)."""
    labels = labels.astype(jnp.int32)
    bound = max(labels.size, 65535)  # same id-bound convention as relabel
    flat = labels.reshape(-1)
    present = jnp.zeros((bound + 1,), jnp.int32).at[
        jnp.clip(flat, 0, bound)].set(1)
    present = present.at[0].set(0)
    return jnp.sum(present)
