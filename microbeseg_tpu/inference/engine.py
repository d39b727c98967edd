"""Inference engine: batched, fused forward + post-processing on device.

Re-design of the reference inference path (src/inference/infer.py:328-376,
infer_script_local.py:117-161): the reference loops frames at batch size 1,
pulls raw predictions to the host, and runs CPU watershed per frame.  Here:

- frames/crops are batched along the leading axis and sharded over the
  'data' mesh axis when a multi-device mesh is provided;
- RAW frames cross the host->device boundary ONCE at their native dtype
  (uint16 microscopy stacks upload at half the float32 bytes); dtype
  conversion, CLAHE, per-frame min/max normalization, scaling, padding,
  forward and de-padding are ONE fused jit per pad bucket, so the 1-core
  host does no per-pixel work at all;
- images larger than the bucket table stream through sliding-window tiling
  with device-side tile extraction and feathered stitching (tiling.py) —
  the reference raises instead.
"""

from __future__ import annotations

import math
from functools import partial
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from microbeseg_tpu.config import InferConfig
from microbeseg_tpu.inference.tiling import (
    extract_tiles,
    stitch_tiles_device,
    tile_positions,
)
from microbeseg_tpu.models.io import load_model
from microbeseg_tpu.ops.augment import clahe
from microbeseg_tpu.ops.postprocessing import (
    boundary_postprocessing,
    distance_postprocessing,
    distance_postprocessing_grid,
)
from microbeseg_tpu.parallel.mesh import batch_sharding, replicated_sharding
from microbeseg_tpu.utils.image import min_max_normalization, pad_bucket_shape


class InferenceEngine:
    """Runs a trained (D)U-Net on 2D frames / 2D+t stacks."""

    def __init__(self, model, variables, label_type: str = "distance",
                 cfg: Optional[InferConfig] = None, mesh=None,
                 max_seeds: Optional[int] = None, extra=()):
        """``extra``: additional ``(model, variables)`` ensemble members
        (beyond reference) whose predictions are averaged with the primary
        model's — see ``from_checkpoints``.  All members must share
        ``label_type``; architectures may differ."""
        self.model = model
        self.label_type = label_type
        self.cfg = cfg or InferConfig()
        if self.cfg.quantize and extra:
            raise ValueError("quantize is not supported for ensembles "
                             "(per-member activation calibration is not "
                             "implemented)")
        # Device-resident weights, uploaded ONCE per engine and passed to
        # every jitted forward as an ARGUMENT.  Closure-captured (or numpy)
        # leaves would be inlined into the lowered module as literal
        # constants — measured 93-185 MB of HLO per (bucket, batch)
        # executable for the flagship, each paying its own trace (4-20 s) +
        # compile (25-42 s) + first-execute constant upload (44 s at 512²,
        # 3-4x that at 2048²) per fresh process, and oversizing the
        # executables past what the persistent compilation cache handles.
        if mesh is not None:
            self.variables = jax.device_put(
                variables, replicated_sharding(mesh))
            self._extra = tuple(
                (m, jax.device_put(v, replicated_sharding(mesh)))
                for m, v in extra)
        else:
            self.variables = jax.device_put(variables)
            self._extra = tuple((m, jax.device_put(v)) for m, v in extra)
        if self.cfg.quantize and hasattr(model, "quantize"):
            # int8 forward: same param tree, eval-mode-only swap of the
            # large-spatial convs to the MXU int8 path (blocks.QuantConv);
            # activation scales are calibrated per padded shape on the
            # first real chunk of that shape (_ensure_quant_calibrated) so
            # the steady-state quantize is fully fused — the dynamic-scale
            # fallback measured neutral.  Per-SHAPE because the layer set
            # that qualifies for int8 grows with frame size: calibrating
            # only at 256^2 would leave the large-frame layers on the
            # dynamic path forever.
            self._quant_shapes: set = set()
            self.model = model.clone(quantize=True)
        self.mesh = mesh
        # None -> instance capacity scales with frame area (_seeds_cap);
        # a fixed int pins it (tests / memory-constrained callers)
        self.max_seeds = max_seeds
        self._forward_cache: Dict = {}
        self._post_cache: Dict = {}

    def _seeds_cap(self, h: int, w: int) -> int:
        """Instance capacity of post-processing for an (h, w) frame.

        256 matches the densest reasonable 256² crop; large stitched frames
        hold thousands of cells (a 2048² synthetic frame carries ~2200), so
        the cap scales with area at one seed per 256 px — capping at 256
        there silently dropped >85% of instances (round-3 scale run).
        Bounded by uint16 output ids and prune-histogram cost."""
        if self.max_seeds is not None:
            return self.max_seeds
        return int(min(32768, max(256, (h * w) // 256)))

    @classmethod
    def from_checkpoint(cls, model_path: Path, cfg: Optional[InferConfig] = None,
                        mesh=None) -> "InferenceEngine":
        model, variables, train_cfg = load_model(model_path)
        return cls(model, variables, train_cfg.label_type, cfg=cfg, mesh=mesh)

    @classmethod
    def from_checkpoints(cls, model_paths, cfg: Optional[InferConfig] = None,
                         mesh=None) -> "InferenceEngine":
        """Ensemble engine (beyond reference): predictions averaged over
        several checkpoints — e.g. the per-iteration models one training
        run produces (reference train.py:171 names them _01, _02, ...).
        Architectures may differ; label types must match.  Averaging
        happens inside the one forward jit (unrolled member loop, exactly
        like the TTA variant loop) and composes with ``cfg.tta``."""
        loaded = [load_model(Path(p)) for p in model_paths]
        label_types = {t.label_type for _, _, t in loaded}
        if len(label_types) > 1:
            raise ValueError(
                f"ensemble members disagree on label_type: {label_types}")
        model, variables, train_cfg = loaded[0]
        return cls(model, variables, train_cfg.label_type, cfg=cfg,
                   mesh=mesh, extra=[(m, v) for m, v, _ in loaded[1:]])

    # ------------------------------------------------------------------

    @property
    def _quant_calibrated(self) -> bool:
        return bool(getattr(self, "_quant_shapes", None))

    def _ensure_quant_calibrated(self, sample: np.ndarray) -> None:
        """int8 activation-scale calibration on a representative chunk of
        NORMALIZED frames (b, h, w): records per-layer |x| maxima into the
        'quant' variable collection (blocks.QuantConv), after which every
        jitted forward uses static scales and the quantize/dequant passes
        fuse away.  Runs once PER PADDED SHAPE (larger frames quantize
        more layers; maxima merge monotonically across shapes); the
        forwards late-bind self.variables, and the updated tree structure
        retraces them with the static scales."""
        if not self.cfg.quantize or not hasattr(self, "_quant_shapes"):
            return
        h, w = int(sample.shape[1]), int(sample.shape[2])
        if (h, w) in self._quant_shapes:
            return
        # respect the engine's own activation-memory budget — a batch-4
        # calibration at 2048^2 would blow past what _device_batch allows
        b = max(1, min(4, self._device_batch(h, w), sample.shape[0]))
        x = jnp.asarray(np.asarray(sample[:b], np.float32)[..., None])
        calib = jax.jit(partial(self.model.apply, train=False,
                                mutable=["quant"]))
        try:
            _, updated = calib(self.variables, x)
            # keep leaves device-resident (numpy would re-inline the tree
            # as HLO literals in every later forward)
            self.variables = {**self.variables, **dict(updated)}
            # no cache clear: the cached wrappers late-bind self.variables,
            # and the added 'quant' collection changes the tree structure,
            # which retraces the forwards on their next call anyway —
            # clearing would also throw away the variable-free prep/tile
            # executables (re-jit costs on the ~25 ms-latency tunnel)
        except Exception as exc:  # OOM -> stay on the dynamic-scale path
            if "RESOURCE_EXHAUSTED" not in str(exc):
                raise
        self._quant_shapes.add((h, w))

    def _var_trees(self):
        """All member variable trees, primary first — late-bound so quant
        calibration's updates to ``self.variables`` are picked up.  Passed
        to every jitted forward as ONE tuple argument (closure capture
        would inline the weights as HLO literals — see __init__)."""
        return (self.variables, *(v for _, v in self._extra))

    def _net_apply(self, variables, x) -> Tuple[jnp.ndarray, ...]:
        """Traced model application on normalized, padded (B, H, W, 1)
        input; returns distance -> (border, cell) each (B, H, W), boundary
        -> (softmax probs (B, H, W, 3),).  ``variables`` is the tuple of
        member trees from ``_var_trees`` (length 1 without an ensemble).

        Ensemble members (``from_checkpoints``) average head-wise —
        probability averaging for the boundary softmax, field averaging
        for the distance heads.  With ``cfg.tta`` (beyond reference)
        predictions are additionally averaged over the shape-preserving
        dihedral transforms: the 4 flip variants, or all 8 of D4 when
        H == W (the group the training augmentation's Flip stage samples,
        reference mytransforms.py:129-230, so the model is
        near-equivariant and the variants decorrelate).  Both heads are
        scalar fields — invariant under the transform, so inverse-mapping
        the prediction and averaging is exact.  Member and variant loops
        unroll inside the one jit: live memory stays ~one forward (XLA
        schedules the accumulation chain sequentially) at
        members x variants times the FLOPs."""
        label_type = self.label_type
        models = (self.model, *(m for m, _ in self._extra))

        def base(xv):
            acc = None
            for mdl, var in zip(models, variables):
                preds = mdl.apply(var, xv, train=False)
                if label_type == "distance":
                    out = (preds[0][..., 0], preds[1][..., 0])
                else:
                    out = (jax.nn.softmax(preds, axis=-1),)
                acc = (list(out) if acc is None
                       else [a + b for a, b in zip(acc, out)])
            return tuple(a / len(models) for a in acc)

        if not self.cfg.tta:
            return base(x)
        square = x.shape[1] == x.shape[2]
        variants = [(t, fy, fx)
                    for t in ((False, True) if square else (False,))
                    for fy in (False, True)
                    for fx in (False, True)]
        acc = None
        for t, fy, fx in variants:
            xv = jnp.swapaxes(x, 1, 2) if t else x
            xv = jnp.flip(xv, 1) if fy else xv
            xv = jnp.flip(xv, 2) if fx else xv
            inv = []
            for p in base(xv):  # invert in reverse order
                p = jnp.flip(p, 2) if fx else p
                p = jnp.flip(p, 1) if fy else p
                inv.append(jnp.swapaxes(p, 1, 2) if t else p)
            acc = inv if acc is None else [a + b for a, b in zip(acc, inv)]
        return tuple(a / len(variants) for a in acc)

    def _forward_fn(self, pad_y: int, pad_x: int):
        """Jitted pad-cropping forward pass on already-NORMALIZED input
        (used by the tiled path, whose prep runs in a separate device
        stage so frame-global min/max precede tile extraction)."""
        key = (pad_y, pad_x)
        if key in self._forward_cache:
            return self._forward_cache[key]

        label_type = self.label_type

        # variables ride as an ARGUMENT, never a closure: closure-captured
        # arrays are inlined into the lowered module as literal constants
        # (93-185 MB of HLO per executable for the flagship), multiplying
        # trace/compile/upload time per bucket and defeating the persistent
        # compilation cache.  As an argument the weights are one shared
        # device tree across every executable.
        def forward(variables, images):
            # images: (B, Hb, Wb, 1) float32 already normalized to [-1, 1]
            preds = self._net_apply(variables, images)
            if label_type == "distance":
                border, cell = preds
                return (border[:, pad_y:, pad_x:],
                        cell[:, pad_y:, pad_x:])
            return preds[0][:, pad_y:, pad_x:, :]

        if self.mesh is not None:
            fn = jax.jit(forward,
                         in_shardings=(replicated_sharding(self.mesh),
                                       batch_sharding(self.mesh)))
        else:
            fn = jax.jit(forward)
        # late-bound so quant calibration's variable updates are picked up
        # (a changed tree structure simply retraces)
        wrapped = lambda *a: fn(self._var_trees(), *a)  # noqa: E731
        self._forward_cache[key] = wrapped
        return wrapped

    def _prep_ops(self, x: jnp.ndarray) -> jnp.ndarray:
        """Traced pre-processing: raw (B, H, W) frames (any uploaded dtype)
        -> float32 normalized to [-1, 1].  Mirrors the host reference chain
        `_normalize_batch` exactly: optional CLAHE on the [0, 1]-rescaled
        frame (reference ContrastEnhancement, inference_dataset.py:50-66),
        then per-frame min/max to [-1, 1] (reference Normalization,
        :69-78); a constant frame maps to all-zero like
        utils.min_max_normalization."""
        x = x.astype(jnp.float32)
        if self.cfg.apply_clahe:
            mn = x.min(axis=(1, 2), keepdims=True)
            mx = x.max(axis=(1, 2), keepdims=True)
            x01 = (x - mn) / jnp.maximum(mx - mn, 1e-7)
            x = jax.vmap(clahe)(x01) * 65535.0
        mn = x.min(axis=(1, 2), keepdims=True)
        mx = x.max(axis=(1, 2), keepdims=True)
        denom = mx - mn
        # divide by the TRUE range (host parity even for float frames with
        # tiny dynamic range); the where-guard only covers constant frames
        safe = jnp.where(denom > 0, denom, 1.0)
        return jnp.where(denom > 0, 2.0 * (x - mn) / safe - 1.0, 0.0)

    def _fused_forward_fn(self, h: int, w: int, dtype_key: str):
        """One fused jit for the bucket path: raw (B, h, w) frames ->
        de-padded predictions at (B, h, w).  Fuses dtype conversion, CLAHE,
        per-frame normalization, optional down/up-scaling, bucket padding
        (-1 = normalized frame minimum, reference inference_dataset.py:96-104)
        and the forward pass, so only raw frames go up and only predictions
        stay on device — the 1-core host touches no pixels."""
        key = ("fused", h, w, dtype_key)
        if key in self._forward_cache:
            return self._forward_cache[key]

        scale = self.cfg.scale_factor
        sh = max(int(round(h * scale)), 1) if scale < 1 else h
        sw = max(int(round(w * scale)), 1) if scale < 1 else w
        th, tw = pad_bucket_shape(sh, sw)
        pad_y, pad_x = th - sh, tw - sw
        label_type = self.label_type

        # variables as ARGUMENT, not closure — see _forward_fn
        def forward(variables, raw):
            x = self._prep_ops(raw)
            if scale < 1:
                # reference Scaling: order-2 down (inference_dataset.py:
                # 107-126); predictions come back up bilinearly
                x = jax.image.resize(x, (x.shape[0], sh, sw), "cubic")
            x = jnp.pad(x, ((0, 0), (pad_y, 0), (pad_x, 0)),
                        constant_values=-1.0)
            preds = self._net_apply(variables, x[..., None])
            if label_type == "distance":
                border, cell = preds
                border = border[:, pad_y:, pad_x:]
                cell = cell[:, pad_y:, pad_x:]
                if scale < 1:
                    out = (border.shape[0], h, w)
                    border = jax.image.resize(border, out, "linear")
                    cell = jax.image.resize(cell, out, "linear")
                return border, cell
            probs = preds[0][:, pad_y:, pad_x:, :]
            if scale < 1:
                probs = jax.image.resize(
                    probs, (probs.shape[0], h, w, probs.shape[-1]), "linear")
            return probs

        if self.mesh is not None:
            fn = jax.jit(forward,
                         in_shardings=(replicated_sharding(self.mesh),
                                       batch_sharding(self.mesh)))
        else:
            fn = jax.jit(forward)
        wrapped = lambda *a: fn(self._var_trees(), *a)  # noqa: E731
        self._forward_cache[key] = wrapped
        return wrapped

    def _extract_fn(self, tile: int, pos):
        """Jitted device tile extraction: normalized (B, H, W) frames ->
        (B, n_tiles, tile, tile) via a scan of dynamic slices (row-granular
        reads — contiguous rectangles, nearly free on TPU)."""
        key = ("tiles", tile, tuple(pos))
        if key in self._forward_cache:
            return self._forward_cache[key]
        ys = jnp.asarray([p[0] for p in pos], jnp.int32)
        xs = jnp.asarray([p[1] for p in pos], jnp.int32)

        def extract(frames):
            def one(frame):
                def get(_, yx):
                    y, x = yx
                    return None, jax.lax.dynamic_slice(
                        frame, (y, x), (tile, tile))
                _, tiles = jax.lax.scan(get, None, (ys, xs))
                return tiles
            return jax.vmap(one)(frames)

        fn = jax.jit(extract)
        self._forward_cache[key] = fn
        return fn

    # ------------------------------------------------------------------

    # dtypes that upload as-is: raw microscopy frames cross the ~25 ms-
    # latency tunnel at their native width (uint16 = half the float32
    # bytes); anything else falls back to float32 host-side
    _UPLOAD_DTYPES = frozenset(
        ("uint8", "uint16", "int16", "int32", "float32"))

    def _canon_frames(self, frames: np.ndarray) -> np.ndarray:
        if str(frames.dtype) in self._UPLOAD_DTYPES:
            return frames
        return frames.astype(np.float32)

    def _normalize_batch(self, frames: np.ndarray) -> np.ndarray:
        """Per-frame min/max normalization to [-1, 1] (reference
        infer.py:253,346), optional CLAHE pre-enhancement.

        HOST-SIDE REFERENCE PATH: the hot pipeline normalizes on device
        inside the fused forward (`_prep_ops`); this copy exists for int8
        calibration samples and as the golden reference the device prep is
        tested against."""
        if self.cfg.apply_clahe:
            f = np.asarray(frames, np.float32)
            fmin = f.min(axis=(1, 2), keepdims=True)
            fmax = f.max(axis=(1, 2), keepdims=True)
            f01 = (f - fmin) / np.maximum(fmax - fmin, 1e-7)
            frames = np.asarray(
                self._batched_clahe()(jnp.asarray(f01))) * 65535.0
        out = np.empty(frames.shape, np.float32)
        for i, f in enumerate(frames):
            out[i] = min_max_normalization(f)
        return out

    def _batched_clahe(self):
        fn = self._post_cache.get("clahe")
        if fn is None:
            fn = jax.jit(jax.vmap(clahe))
            self._post_cache["clahe"] = fn
        return fn

    def _rescale(self, arrays: jnp.ndarray, out_hw: Tuple[int, int],
                 method: str) -> jnp.ndarray:
        """Spatial resize of a (T, H, W[, C]) batch, on device."""
        shape = (arrays.shape[0],) + tuple(out_hw) + arrays.shape[3:]
        return jax.image.resize(jnp.asarray(arrays), shape, method)

    def predict_raw(self, frames: np.ndarray) -> Tuple[np.ndarray, ...]:
        """CNN predictions for a (T, H, W) stack (or (1, H, W) single frame).

        Returns de-padded predictions at the ORIGINAL resolution: distance ->
        (border, cell) each (T, H, W); boundary -> (T, H, W, 3) softmax.
        ``cfg.scale_factor < 1`` downscales the normalized input before the
        forward pass (reference Scaling transform,
        src/inference/inference_dataset.py:107-126, order-2 interpolation) and
        upscales the float predictions back before post-processing.
        """
        frames = np.asarray(frames)
        if frames.ndim == 2:
            frames = frames[None]
        T, H, W = frames.shape
        cap = self._resident_frames_cap(H, W, frames.dtype)
        outs = []
        for s in range(0, T, cap):
            chunk = []
            for p in self._predict_raw_dev(frames[s:s + cap]):
                # the fetch is the first point that synchronizes the device
                # chain on this runtime (block_until_ready does not block
                # through the axon tunnel) — map a RESOURCE_EXHAUSTED here
                # to the reference's zero-prediction fallback
                # (infer.py:353-356), as segment() does for masks
                try:
                    chunk.append(np.asarray(p))
                except Exception as exc:
                    if "RESOURCE_EXHAUSTED" not in str(exc):
                        raise
                    chunk.append(np.zeros(p.shape, p.dtype))
            outs.append(tuple(chunk))
        if len(outs) == 1:
            return outs[0]
        return tuple(np.concatenate([o[i] for o in outs])
                     for i in range(len(outs[0])))

    def _resident_frames_cap(self, h: int, w: int, dtype) -> int:
        """Frames of a stack that may be device-resident at once.

        The raw upload plus the full-stack float32 prediction maps scale
        with T (the per-chunk activation/postproc footprints are bounded
        separately by ``_device_batch``/``_prep_chunk_cap``); a 300-frame
        2048^2 distance stack would hold ~10 GB of predictions.  Callers
        (``segment``/``predict_raw``) process the stack in super-chunks of
        this many frames so HBM stays bounded in T."""
        pred_bytes = 8 if self.label_type == "distance" else 12
        per_frame = h * w * (np.dtype(dtype).itemsize + pred_bytes)
        return max(1, (6 << 30) // max(per_frame, 1))

    def _predict_raw_dev(self, frames: np.ndarray) -> Tuple[jnp.ndarray, ...]:
        """``predict_raw`` with DEVICE-RESIDENT outputs: segment() feeds
        them straight into on-device post-processing, so predictions never
        bounce to the host between stages (each bounce costs a full-frame
        transfer over the ~25 ms tunnel — at 2048^2+ transfers, not compute,
        dominated the round-2 tiled path).  The stack uploads ONCE at its
        native dtype; all pre-processing runs on device."""
        frames = np.asarray(frames)
        if frames.ndim == 2:
            frames = frames[None]
        frames = self._canon_frames(frames)
        T, H, W = frames.shape
        scale = self.cfg.scale_factor
        sh = max(int(round(H * scale)), 1) if scale < 1 else H
        sw = max(int(round(W * scale)), 1) if scale < 1 else W
        try:
            th, tw = pad_bucket_shape(sh, sw)
            tiled = False
        except ValueError:
            tiled = True
        if tiled or (self.cfg.use_tiling and
                     max(sh, sw) > self.cfg.tile_size):
            return self._predict_tiled(frames)
        return self._predict_bucket(frames, sh, sw, th, tw)

    def _predict_bucket(self, frames: np.ndarray, sh: int, sw: int,
                        th: int, tw: int) -> Tuple[jnp.ndarray, ...]:
        """Bucket-pad path: one raw upload, then fused prep+forward chunks
        (one executable per (frame shape, dtype))."""
        T, H, W = frames.shape
        self._maybe_calibrate_bucket(frames, sh, sw, th, tw)
        fwd = self._fused_forward_fn(H, W, str(frames.dtype))
        bs = min(self._device_batch(th, tw), self._prep_chunk_cap(H, W))
        raw = jnp.asarray(frames)  # ONE transfer, native dtype
        n_pad = (-T) % bs
        outs = []
        for s in range(0, T + n_pad, bs):
            chunk = raw[s:s + bs]
            if chunk.shape[0] < bs:  # pad only the ragged tail chunk
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((bs - chunk.shape[0], H, W),
                                      raw.dtype)])
            try:
                out = fwd(chunk)
                jax.block_until_ready(out)  # surface OOM at this chunk
                outs.append(out)
            except Exception as exc:  # OOM fallback: zero predictions for
                # the chunk (reference returns an all-zero mask per frame,
                # infer.py:353-356, infer_script_local.py:136-140)
                if "RESOURCE_EXHAUSTED" not in str(exc):
                    raise
                zero = jnp.zeros((bs, H, W), jnp.float32)
                outs.append((zero, zero) if self.label_type == "distance"
                            else jnp.zeros((bs, H, W, 3), jnp.float32))
        if self.label_type == "distance":
            border = jnp.concatenate([o[0] for o in outs])[:T]
            cell = jnp.concatenate([o[1] for o in outs])[:T]
            return border, cell
        probs = jnp.concatenate(outs)[:T]
        return (probs,)

    def _maybe_calibrate_bucket(self, frames: np.ndarray, sh: int, sw: int,
                                th: int, tw: int) -> None:
        """int8 calibration sample for the bucket path, built through the
        host reference chain (normalize -> scale -> pad) so it matches what
        the fused forward computes on device."""
        if not (self.cfg.quantize and hasattr(self, "_quant_shapes")):
            return
        if (th, tw) in self._quant_shapes:
            return
        # the sample build itself can OOM (batched CLAHE one-hot at full
        # frame resolution); respect the CLAHE chunk cap and fall back to
        # dynamic activation scales like _ensure_quant_calibrated does
        n = max(1, min(4, self._prep_chunk_cap(*frames.shape[1:])))
        try:
            norm = self._normalize_batch(np.asarray(frames[:n]))
            if (sh, sw) != norm.shape[1:]:
                norm = np.asarray(self._rescale(norm, (sh, sw), "cubic"))
        except Exception as exc:
            if "RESOURCE_EXHAUSTED" not in str(exc):
                raise
            self._quant_shapes.add((th, tw))
            return
        padded = np.pad(norm, ((0, 0), (th - sh, 0), (tw - sw, 0)),
                        constant_values=-1.0)
        self._ensure_quant_calibrated(padded)


    def _prep_chunk_cap(self, h: int, w: int) -> int:
        """Frames per device call the PREP stage can afford.  CLAHE
        materializes an (H*W, nbins) bf16 one-hot per frame at UNSCALED
        resolution (ops/augment.clahe — ~2.1 GB at 2048^2), which the
        model-activation-based `_device_batch` knows nothing about; cap so
        the one-hot stays under ~2 GB per chunk (per chip — under a mesh
        the cap multiplies by the device count, keeping every chunk
        divisible by the mesh size like `_device_batch`)."""
        if not self.cfg.apply_clahe:
            return 1 << 30
        return max(1, (2 << 30) // (h * w * 256 * 2)) * self._n_devices

    @property
    def _n_devices(self) -> int:
        return 1 if self.mesh is None else int(
            np.prod(list(self.mesh.shape.values())))

    def _device_batch(self, h: int, w: int) -> int:
        """Frames/tiles per device call, scaled by area so the activation
        footprint stays bounded: cfg.batch_size applies at 256^2 (the
        calibration size; 16 measured optimal on v5e) and larger buckets
        batch fewer frames — the batch-16 default must not OOM a 1024^2
        bucket.  The 2x headroom factor is measured: 512^2 runs 5.9 ms/crop
        at batch 8 vs 9.5 at the area-proportional batch 4.

        Under a mesh the PER-CHIP cap multiplies by the device count (DP
        scaling) — which also keeps the global batch divisible by the
        mesh size, a hard requirement of the sharded jits (a non-divisible
        chunk raises at dispatch)."""
        area = max(h * w, 1)
        per_chip = max(1, min(self.cfg.batch_size,
                              (self.cfg.batch_size * 2 * 256 * 256) // area))
        return per_chip * self._n_devices

    def _predict_tiled(self, frames: np.ndarray) -> Tuple[jnp.ndarray, ...]:
        """Sliding-window path for images beyond the pad-bucket table.

        ``frames`` are RAW (canonicalized dtype).  Fully device-resident:
        the raw stack uploads ONCE at native dtype (uint16 = half the f32
        bytes, and no halo duplication on the wire — host-extracted f32
        tiles cost ~2.6x the transfer); per frame-chunk a prep jit
        normalizes with frame-global min/max, tiles are carved on device by
        dynamic-slice scan, predictions stitch on device (feathered), and
        only the final maps feed post-processing.  Memory stays bounded by
        processing frame chunks end-to-end instead of holding every tile."""
        tile = self.cfg.tile_size
        overlap = self.cfg.tile_overlap
        T, H, W = frames.shape
        scale = self.cfg.scale_factor
        sh = max(int(round(H * scale)), 1) if scale < 1 else H
        sw = max(int(round(W * scale)), 1) if scale < 1 else W
        # narrow frames (one side below the tile): tile over the PADDED
        # extent and crop the stitched maps back — forced tiling on e.g.
        # 256x2048 frames, or genuinely huge narrow images beyond the
        # bucket table, must not fail
        ph = max(tile - sh, 0)
        pw = max(tile - sw, 0)
        ys = tile_positions(sh + ph, tile, overlap)
        xs = tile_positions(sw + pw, tile, overlap)
        pos = [(y, x) for y in ys for x in xs]
        n = len(pos)
        bs_tile = self._device_batch(tile, tile)
        # frames per chunk: a multiple of bs_tile worth of tiles when
        # possible (zero forward padding waste), capped by a tile-memory
        # budget and the stack length
        ideal = bs_tile // math.gcd(n, bs_tile)
        budget = max(bs_tile, (256 << 20) // (tile * tile * 4))
        bs0 = max(1, min(ideal, max(1, budget // n),
                         self._prep_chunk_cap(H, W), T))

        self._maybe_calibrate_tiles(frames, tile, overlap, sh, sw)
        prep = self._prep_fn(sh, sw)
        extract = self._extract_fn(tile, pos)
        fwd = self._forward_fn(0, 0)

        raw = jnp.asarray(frames)  # ONE transfer, native dtype
        n_pad0 = (-T) % bs0

        stitched = []
        for s in range(0, T + n_pad0, bs0):
            chunk = raw[s:s + bs0]
            if chunk.shape[0] < bs0:  # pad only the ragged tail chunk
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((bs0 - chunk.shape[0], H, W),
                                      raw.dtype)])
            norm = prep(chunk)                   # (bs0, sh, sw) on device
            if ph or pw:  # narrow frame: pad to the tile extent (-1 =
                # normalized minimum, same value as bucket padding)
                norm = jnp.pad(norm, ((0, 0), (0, ph), (0, pw)),
                               constant_values=-1.0)
            flat = extract(norm).reshape(bs0 * n, tile, tile)
            m = bs0 * n
            pad_t = (-m) % bs_tile
            if pad_t:
                flat = jnp.concatenate(
                    [flat, jnp.zeros((pad_t, tile, tile), flat.dtype)])
            preds = [fwd(flat[ts:ts + bs_tile][..., None])
                     for ts in range(0, m + pad_t, bs_tile)]
            if self.label_type == "distance":
                b_all = jnp.concatenate(
                    [p[0] for p in preds])[:m].reshape(bs0, n, tile, tile)
                c_all = jnp.concatenate(
                    [p[1] for p in preds])[:m].reshape(bs0, n, tile, tile)
                stitched.append(
                    (stitch_tiles_device(b_all, pos,
                                         (sh + ph, sw + pw))[:, :sh, :sw],
                     stitch_tiles_device(c_all, pos,
                                         (sh + ph, sw + pw))[:, :sh, :sw]))
            else:
                probs = jnp.concatenate(preds)[:m].reshape(
                    bs0, n, tile, tile, 3)
                # channels ride the stitch batch axis: (bs0*3, n, tile, tile)
                chan = jnp.moveaxis(probs, -1, 1).reshape(
                    bs0 * 3, n, tile, tile)
                sp = stitch_tiles_device(chan, pos, (sh + ph, sw + pw))
                sp = sp.reshape(bs0, 3, sh + ph, sw + pw)[:, :, :sh, :sw]
                stitched.append((jnp.moveaxis(sp, 1, -1),))

        parts = tuple(jnp.concatenate([c[i] for c in stitched])[:T]
                      for i in range(len(stitched[0])))
        if scale < 1:
            parts = tuple(
                jax.image.resize(p, (T, H, W) + p.shape[3:], "linear")
                for p in parts)
        return parts

    def _prep_fn(self, sh: int, sw: int):
        """Jitted tiled-path prep: raw frame chunk -> normalized frames on
        device, resized to (sh, sw) when scale_factor < 1 (frame-global
        min/max must precede tile extraction; the resize fuses into the
        same executable).  jit specializes per input shape/dtype itself."""
        key = ("prep", sh, sw)
        if key in self._forward_cache:
            return self._forward_cache[key]
        scale = self.cfg.scale_factor

        def prep(raw):
            x = self._prep_ops(raw)
            if scale < 1:
                x = jax.image.resize(x, (x.shape[0], sh, sw), "cubic")
            return x

        fn = jax.jit(prep)
        self._forward_cache[key] = fn
        return fn

    def _maybe_calibrate_tiles(self, frames: np.ndarray, tile: int,
                               overlap: int, sh: int, sw: int) -> None:
        """int8 calibration sample for the tiled path: host-built tiles of
        the first frame through the reference normalize chain."""
        if not (self.cfg.quantize and hasattr(self, "_quant_shapes")):
            return
        if (tile, tile) in self._quant_shapes:
            return
        try:
            norm = self._normalize_batch(np.asarray(frames[:1]))
            if (sh, sw) != norm.shape[1:]:
                norm = np.asarray(self._rescale(norm, (sh, sw), "cubic"))
        except Exception as exc:  # CLAHE one-hot OOM at full resolution ->
            # stay on dynamic activation scales
            if "RESOURCE_EXHAUSTED" not in str(exc):
                raise
            self._quant_shapes.add((tile, tile))
            return
        tiles, _ = extract_tiles(norm[0], tile, overlap)
        self._ensure_quant_calibrated(tiles)

    # ------------------------------------------------------------------

    def segment(self, frames: np.ndarray,
                th_cell: Optional[float] = None,
                th_seed: Optional[float] = None) -> np.ndarray:
        """Full pipeline: (T, H, W) raw frames -> (T, H, W) uint16 instances."""
        frames = np.asarray(frames)
        squeeze = frames.ndim == 2
        if squeeze:
            frames = frames[None]
        th_cell = self.cfg.th_cell if th_cell is None else th_cell
        th_seed = self.cfg.th_seed if th_seed is None else th_seed

        # long 2D+t stacks: bound device residency in T (raw upload + full
        # prediction maps) by segmenting super-chunks independently —
        # per-frame normalization makes the split semantically free
        cap = self._resident_frames_cap(frames.shape[1], frames.shape[2],
                                        frames.dtype)
        if frames.shape[0] > cap:
            masks = np.empty(frames.shape, np.uint16)
            for s in range(0, frames.shape[0], cap):
                masks[s:s + cap] = self.segment(frames[s:s + cap],
                                                th_cell, th_seed)
            return masks

        # device-resident predictions: forward/stitch outputs feed the
        # on-device post-processing directly, only uint16 masks come home
        preds = self._predict_raw_dev(frames)
        T = frames.shape[0]
        masks = np.empty(frames.shape, np.uint16)
        bs = self._device_batch(frames.shape[1], frames.shape[2])
        from microbeseg_tpu.ops.pallas.flood import MAX_VMEM_SIDE
        post = self._post_fn(
            self._seeds_cap(frames.shape[1], frames.shape[2]),
            big=max(frames.shape[1], frames.shape[2]) > MAX_VMEM_SIDE)

        def pad_tail(chunk):
            # keep every call at the full batch shape: one executable
            # instead of an extra compile for the ragged tail chunk
            if chunk.shape[0] == bs or T <= bs:
                return chunk
            return jnp.concatenate(
                [chunk, jnp.zeros((bs - chunk.shape[0],) + chunk.shape[1:],
                                  chunk.dtype)])

        def fetch(dst, device_masks):
            # the np.asarray fetch is the first point that SYNCHRONIZES the
            # device chain on this runtime (CLAUDE.md: block_until_ready
            # does not actually block through the axon tunnel), so a
            # RESOURCE_EXHAUSTED from the forward or post-processing
            # surfaces HERE — map it to the reference's all-zero-mask
            # fallback (infer.py:353-356) instead of crashing
            try:
                dst[...] = np.asarray(device_masks)[:dst.shape[0]]
            except Exception as exc:
                if "RESOURCE_EXHAUSTED" not in str(exc):
                    raise
                dst[...] = 0

        if self.label_type == "distance":
            border, cell = preds
            ts = jnp.float32(th_seed)
            tc = jnp.float32(th_cell)
            for s in range(0, T, bs):
                n = min(bs, T - s)
                chunk_b = pad_tail(border[s:s + bs])
                chunk_c = pad_tail(cell[s:s + bs])
                fetch(masks[s:s + n], post(chunk_b, chunk_c, ts, tc))
        else:
            (probs,) = preds
            for s in range(0, T, bs):
                n = min(bs, T - s)
                fetch(masks[s:s + n], post(pad_tail(probs[s:s + bs])))
        return masks[0] if squeeze else masks

    def _post_fn(self, max_seeds: int, big: bool = False):
        """Jitted post-processing, cached per engine: thresholds ride as
        traced scalars so repeated ``segment`` calls (any thresholds) hit
        one executable per batch shape instead of re-tracing per call.

        ``big`` (frames beyond the VMEM side limit): the frame batch maps
        SEQUENTIALLY (lax.map) instead of vmapping — the tiled flood /
        warm-start Pallas kernels put their window batch on the pallas
        grid, a vmapped batch axis multiplies into that grid, and Mosaic's
        scoped-VMEM accounting rejects long grids (batch 4 x 16 windows
        measured 18.6 MB and failed to compile; grid <= 16 fits).  Big
        frames run at device batch 1-2 anyway, so sequencing costs nothing.
        """
        key = (self.label_type, max_seeds, big)
        fn = self._post_cache.get(key)
        if fn is None:
            if self.label_type == "distance":
                post = partial(distance_postprocessing, max_seeds=max_seeds)
                if big:
                    fn = jax.jit(lambda b, c, ts, tc: jax.lax.map(
                        lambda bc: post(bc[0], bc[1], ts, tc), (b, c)))
                else:
                    fn = jax.jit(jax.vmap(post, in_axes=(0, 0, None, None)))
            else:
                post = partial(boundary_postprocessing, max_seeds=max_seeds)
                if big:
                    fn = jax.jit(lambda p: jax.lax.map(post, p))
                else:
                    fn = jax.jit(jax.vmap(post))
            self._post_cache[key] = fn
        return fn

    def segment_grid(self, frame: np.ndarray,
                     th_pairs) -> np.ndarray:
        """Threshold-grid segmentation of one frame: (n, H, W) uint16
        (device-parallel over the grid; used by evaluation).  Distance
        models only — the boundary method has no thresholds to grid over
        (reference eval.py:127-131 applies the grid to 'distance')."""
        if self.label_type != "distance":
            raise ValueError(
                "segment_grid applies only to distance models; use "
                "segment() for the boundary method (no threshold grid)")
        border, cell = self._predict_raw_dev(frame[None])
        return np.asarray(distance_postprocessing_grid(
            border[0], cell[0],
            jnp.asarray(th_pairs, jnp.float32),
            max_seeds=self._seeds_cap(*frame.shape[-2:])))
