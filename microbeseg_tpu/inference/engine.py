"""Inference engine: batched, fused forward + post-processing on device.

Re-design of the reference inference path (src/inference/infer.py:328-376,
infer_script_local.py:117-161): the reference loops frames at batch size 1,
pulls raw predictions to the host, and runs CPU watershed per frame.  Here:

- frames/crops are batched along the leading axis and sharded over the
  'data' mesh axis when a multi-device mesh is provided;
- pad -> normalize -> forward -> de-pad -> post-process is one jit per pad
  bucket (static pad sizes come from the bucket table, so a handful of
  executables cover every input size);
- images larger than the bucket table stream through sliding-window tiling
  with feathered stitching (tiling.py) — the reference raises instead.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from microbeseg_tpu.config import InferConfig, PAD_BUCKETS
from microbeseg_tpu.inference.tiling import extract_tiles, stitch_tiles_device
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
                 max_seeds: Optional[int] = None):
        self.model = model
        self.variables = variables
        self.label_type = label_type
        self.cfg = cfg or InferConfig()
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
        more layers; maxima merge monotonically across shapes) and must
        run before that shape's _forward_fn build — the jitted forwards
        close over self.variables."""
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
            self.variables = {**self.variables, **jax.device_get(updated)}
            self._forward_cache.clear()
        except Exception as exc:  # OOM -> stay on the dynamic-scale path
            if "RESOURCE_EXHAUSTED" not in str(exc):
                raise
        self._quant_shapes.add((h, w))

    def _forward_fn(self, pad_y: int, pad_x: int):
        """Jitted pad-cropping forward pass for one pad bucket."""
        key = (pad_y, pad_x)
        if key in self._forward_cache:
            return self._forward_cache[key]

        model, variables = self.model, self.variables
        label_type = self.label_type

        def forward(images):
            # images: (B, Hb, Wb, 1) float32 already normalized to [-1, 1]
            preds = model.apply(variables, images, train=False)
            if label_type == "distance":
                border, cell = preds
                return (border[:, pad_y:, pad_x:, 0],
                        cell[:, pad_y:, pad_x:, 0])
            probs = jax.nn.softmax(preds, axis=-1)
            return probs[:, pad_y:, pad_x:, :]

        if self.mesh is not None:
            bsh = batch_sharding(self.mesh)
            fn = jax.jit(forward, in_shardings=bsh)
        else:
            fn = jax.jit(forward)
        self._forward_cache[key] = fn
        return fn

    # ------------------------------------------------------------------

    def _normalize_batch(self, frames: np.ndarray) -> np.ndarray:
        """Per-frame min/max normalization to [-1, 1] (reference
        infer.py:253,346), optional CLAHE pre-enhancement.

        CLAHE runs vmapped over the whole stack in ONE device call — the
        per-frame loop cost one ~25 ms tunnel round-trip per frame on this
        hardware (host<->device latency dominates at stack lengths)."""
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
        return tuple(np.asarray(p) for p in self._predict_raw_dev(frames))

    def _predict_raw_dev(self, frames: np.ndarray) -> Tuple[jnp.ndarray, ...]:
        """``predict_raw`` with DEVICE-RESIDENT outputs: segment() feeds
        them straight into on-device post-processing, so predictions never
        bounce to the host between stages (each bounce costs a full-frame
        transfer over the ~25 ms tunnel — at 2048^2+ transfers, not compute,
        dominated the round-2 tiled path)."""
        frames = np.asarray(frames)
        if frames.ndim == 2:
            frames = frames[None]
        T, H0, W0 = frames.shape
        norm = self._normalize_batch(frames)
        scale = self.cfg.scale_factor
        if scale < 1:
            sh = max(int(round(H0 * scale)), 1)
            sw = max(int(round(W0 * scale)), 1)
            norm = np.asarray(self._rescale(norm, (sh, sw), "cubic"))
        preds = self._predict_normalized(norm)
        if scale < 1:
            preds = tuple(self._rescale(p, (H0, W0), "linear") for p in preds)
        return preds

    def _predict_normalized(self, norm: np.ndarray) -> Tuple[jnp.ndarray, ...]:
        """Forward pass on already-normalized (T, H, W) frames; outputs stay
        on device."""
        T, H, W = norm.shape
        try:
            th, tw = pad_bucket_shape(H, W)
            tiled = False
        except ValueError:
            tiled = True
        if tiled or (self.cfg.use_tiling and
                     max(H, W) > self.cfg.tile_size):
            return self._predict_tiled(norm)

        pad_y, pad_x = th - H, tw - W
        # pad with the normalized image minimum (-1): the reference pads the
        # image with img.min() AFTER [-1,1] normalization
        # (inference_dataset.py:96-104 Padding pad_val=np.min(img),
        # infer.py:256 via zero_pad_model_input on the raw frame minimum)
        padded = np.pad(norm, ((0, 0), (pad_y, 0), (pad_x, 0)),
                        constant_values=-1.0)
        self._ensure_quant_calibrated(padded)
        fwd = self._forward_fn(pad_y, pad_x)

        outs = []
        bs = self._device_batch(th, tw)
        n_pad = (-T) % bs
        padded = np.concatenate(
            [padded, np.zeros((n_pad, th, tw), np.float32)]) if n_pad else padded
        for s in range(0, padded.shape[0], bs):
            chunk = jnp.asarray(padded[s:s + bs][..., None])
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


    def _device_batch(self, h: int, w: int) -> int:
        """Frames/tiles per device call, scaled by area so the activation
        footprint stays bounded: cfg.batch_size applies at 256^2 (the
        calibration size; 16 measured optimal on v5e) and larger buckets
        batch fewer frames — the batch-16 default must not OOM a 1024^2
        bucket.  The 2x headroom factor is measured: 512^2 runs 5.9 ms/crop
        at batch 8 vs 9.5 at the area-proportional batch 4."""
        area = max(h * w, 1)
        return max(1, min(self.cfg.batch_size,
                          (self.cfg.batch_size * 2 * 256 * 256) // area))

    def _predict_tiled(self, norm_frames: np.ndarray) -> Tuple[jnp.ndarray, ...]:
        """Sliding-window path for images beyond the pad-bucket table.

        ``norm_frames`` are already normalized to [-1, 1].  Fully
        device-resident: tiles upload once (chunked), predictions stay on
        device, stitching is a scan of row-granular dynamic-slice updates,
        and the stitched maps feed post-processing without a host bounce —
        the round-2 version fetched per-tile predictions and stitched in
        float64 numpy on the 1-core host, which made 2048^2+ frames
        transfer-bound over the tunnel."""
        tile = self.cfg.tile_size
        overlap = self.cfg.tile_overlap
        T, H, W = norm_frames.shape
        if min(H, W) < tile:
            raise ValueError(
                f"image {H}x{W} smaller than tile {tile}; shrink tile_size")
        bs = self._device_batch(tile, tile)

        # collect tiles across ALL frames so the device sees full batches
        # regardless of per-frame tile counts (the spatial tiles ride the
        # batch axis, which is also the mesh-sharded axis)
        all_tiles, all_pos = [], []
        for t in range(T):
            frame_tiles, pos = extract_tiles(norm_frames[t], tile, overlap)
            all_tiles.append(frame_tiles)
            all_pos.extend(pos)
        tiles = np.concatenate(all_tiles)
        n = tiles.shape[0]
        n_pad = (-n) % bs
        if n_pad:
            tiles = np.concatenate(
                [tiles, np.zeros((n_pad, tile, tile), np.float32)])
        self._ensure_quant_calibrated(tiles)
        fwd = self._forward_fn(0, 0)
        preds = []
        for s in range(0, tiles.shape[0], bs):
            chunk = jnp.asarray(tiles[s:s + bs][..., None])
            preds.append(fwd(chunk))

        # every frame has the same (H, W), hence the same tile layout: the
        # flat tile axis reshapes to (T, tiles_per_frame, tile, tile) and
        # stitching runs on device, vmapped over frames
        per_frame = len(all_pos) // T
        pos_t = all_pos[:per_frame]
        if self.label_type == "distance":
            border_all = jnp.concatenate([p[0] for p in preds])[:n]
            cell_all = jnp.concatenate([p[1] for p in preds])[:n]
            borders = stitch_tiles_device(
                border_all.reshape(T, per_frame, tile, tile), pos_t, (H, W))
            cells = stitch_tiles_device(
                cell_all.reshape(T, per_frame, tile, tile), pos_t, (H, W))
            return borders, cells
        probs_all = jnp.concatenate(preds)[:n]
        # channels ride the stitch batch axis: (T*3, n, tile, tile)
        chan_major = jnp.moveaxis(
            probs_all.reshape(T, per_frame, tile, tile, 3), -1, 1)
        stitched = stitch_tiles_device(
            chan_major.reshape(T * 3, per_frame, tile, tile), pos_t, (H, W))
        return (jnp.moveaxis(stitched.reshape(T, 3, H, W), 1, -1),)

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

        # device-resident predictions: forward/stitch outputs feed the
        # on-device post-processing directly, only uint16 masks come home
        preds = self._predict_raw_dev(frames)
        T = frames.shape[0]
        masks = np.empty(frames.shape, np.uint16)
        bs = self._device_batch(frames.shape[1], frames.shape[2])
        post = self._post_fn(self._seeds_cap(frames.shape[1],
                                             frames.shape[2]))

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

    def _post_fn(self, max_seeds: int):
        """Jitted, vmapped post-processing, cached per engine: thresholds ride
        as traced scalars so repeated ``segment`` calls (any thresholds) hit
        one executable per batch shape instead of re-tracing per call."""
        key = (self.label_type, max_seeds)
        fn = self._post_cache.get(key)
        if fn is None:
            if self.label_type == "distance":
                fn = jax.jit(jax.vmap(
                    partial(distance_postprocessing, max_seeds=max_seeds),
                    in_axes=(0, 0, None, None)))
            else:
                fn = jax.jit(jax.vmap(
                    partial(boundary_postprocessing, max_seeds=max_seeds)))
            self._post_cache[key] = fn
        return fn

    def segment_grid(self, frame: np.ndarray,
                     th_pairs) -> np.ndarray:
        """Threshold-grid segmentation of one frame: (n, H, W) uint16
        (device-parallel over the grid; used by evaluation)."""
        border, cell = self._predict_raw_dev(frame[None])
        return np.asarray(distance_postprocessing_grid(
            border[0], cell[0],
            jnp.asarray(th_pairs, jnp.float32),
            max_seeds=self._seeds_cap(*frame.shape[-2:])))
