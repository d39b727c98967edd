"""Composed end-to-end >=0.99 mask-IoU parity gate (BASELINE.json north star).

One measurement that chains EVERY parity claim the suite evidences piecewise:

Chain A — the reference's own algorithm chain on a reference-format
checkpoint (the .pth this harness exports):
  torch batch-1 DUNet forward (architecture golden-matched in
  tests/test_torch_import.py) with the reference pre-processing — per-frame
  min/max normalization to [-1, 1] (reference utils.py:50-74, infer.py:346)
  and up-left zero-padding to the tested-shapes bucket (utils.py:124-163,
  infer.py:256) — followed by the scipy/numpy oracle post-processing
  (tests/oracles.distance_postprocessing_oracle == reference
  postprocessing.py:7-59; the per-frame loop mirrors
  infer_script_local.py:117-161).

Chain B — this framework, end to end: the .pth goes through
  models/torch_import.import_torch_checkpoint and the REIMPORTED checkpoint
  drives the full InferenceEngine.segment — dense bucket path, batch > 1,
  and (optionally) the sliding-window tiled path (engine._predict_tiled).

Gate: tests/oracles.masks_iou(A, B) >= 0.99 on every frame, with a
non-vacuity check (each frame must contain instances).  Measured results
live in docs/E2E_RESULTS.md ("Composed end-to-end parity gate"): f32
dense 0.992-0.999; on-chip production bf16 0.988-0.993.  The tiled leg
has NO reference chain to compare against (the reference stubs sliding
windows) — tiled quality is measured against the DENSE truth at
production scale instead (0.9948, docs/PARITY.md); at tiny tiles the
intrinsic GroupNorm tile-statistics coupling and receptive-field
truncation dominate, which is why the default model is 'bn' and the
suite tier runs gn dense-only.

Usage:
  JAX_PLATFORMS=cpu python scripts/parity_gate.py --dtype float32   # honest-f32 gate
  python scripts/parity_gate.py --reuse --dense_only                # on-chip bf16 probe
tests/test_parity_gate.py drives run_gate() on small shapes in the suite.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


# ---------------------------------------------------------------------------
# Synthetic data (self-contained; same distribution for train and gate)
# ---------------------------------------------------------------------------

def blob_sample(rng, size: int, n_blobs: int = 8):
    """One synthetic crop: bright elliptical cells (touching allowed,
    overlap rejected) on a noisy background. Returns (uint16 img, mask)."""
    mask = np.zeros((size, size), np.uint16)
    yy, xx = np.mgrid[0:size, 0:size]
    k = 0
    for _ in range(n_blobs * 3):
        if k >= n_blobs:
            break
        cy, cx = rng.integers(8, size - 8, 2)
        ry, rx = rng.integers(4, 9, 2)
        blob = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        if (mask[blob] > 0).any():
            continue
        k += 1
        mask[blob] = k
    img = ((mask > 0) * 28000.0 + rng.normal(0, 900, (size, size)) + 2500.0)
    return np.clip(img, 0, 65535).astype(np.uint16), mask


def make_training_data(rng, n: int, size: int):
    """TrainingData with oracle-generated distance labels (the reference's
    label algorithm, train_data_representations.py:261-361)."""
    from microbeseg_tpu.training.data import SplitArrays, TrainingData
    from tests.oracles import distance_label_oracle, regionprops_oracle

    images, borders, cells = [], [], []
    for _ in range(n):
        img, mask = blob_sample(rng, size)
        props = regionprops_oracle(mask)
        mal = max((p["major_axis_length"] for p in props), default=8.0)
        cell, border = distance_label_oracle(mask, int(np.ceil(0.75 * mal)))
        images.append(img.astype(np.float32))
        cells.append(cell)
        borders.append(border)

    def stack(arrs):
        return np.stack(arrs)[..., None].astype(np.float32)

    split = SplitArrays(images=stack(images),
                        labels={"border_label": stack(borders),
                                "cell_label": stack(cells)},
                        ids=[str(i) for i in range(n)])
    return TrainingData(train=split, val=split, crop_size=size)


def make_training_data_boundary(rng, n: int, size: int):
    """TrainingData for the 3-class boundary method (labels via the oracle
    re-implementation of reference train_data_representations.py:80-118)."""
    from microbeseg_tpu.training.data import SplitArrays, TrainingData
    from tests.oracles import boundary_label_oracle

    images, labels = [], []
    for _ in range(n):
        img, mask = blob_sample(rng, size)
        images.append(img.astype(np.float32))
        labels.append(boundary_label_oracle(mask).astype(np.int32))
    split = SplitArrays(
        images=np.stack(images)[..., None].astype(np.float32),
        labels={"label": np.stack(labels)[..., None]},
        ids=[str(i) for i in range(n)])
    return TrainingData(train=split, val=split, crop_size=size)


# ---------------------------------------------------------------------------
# Checkpoint plumbing
# ---------------------------------------------------------------------------

def train_tiny(work: Path, rng, size: int = 64, n_train: int = 8,
               epochs: int = 30, filters=(8, 16), seed: int = 3,
               normalization: str = "bn") -> Path:
    """Train a tiny DUNet until its fields threshold confidently; returns
    the checkpoint stem (models_dir / run_name).

    Default 'bn' (the reference's default, train.py:187) and not 'gn' on
    purpose: eval-mode BatchNorm uses FROZEN statistics (precise-BN
    recalibrated by the trainer), so the forward is translation-local and
    the tiled path sees the same normalization as the dense path.
    GroupNorm computes statistics over each padded tile/bucket GLOBALLY —
    the tiled gate leg then measures GN's tile-statistics coupling, not
    pipeline parity (measured: gn tiled leg 0.67-0.78 while dense
    0.97-0.999; flagship-scale coupling is mild, docs/PARITY.md).  The
    in-suite test uses 'gn' with the tiled leg off: bn's per-epoch
    precise-recalibration triples the tiny-model training time."""
    from microbeseg_tpu.config import ModelConfig, TrainConfig
    from microbeseg_tpu.training.trainer import Trainer

    cfg = TrainConfig(
        model=ModelConfig(filters=tuple(filters), act_fun="relu",
                          normalization=normalization),
        optimizer="adam", batch_size=4, run_name="parity_model_01",
        # bound via max_epochs (>= 20 keeps the plateau-schedule integer
        # divisions meaningful); should_stop would trigger the reference's
        # user-stop semantics, which DELETE the partial checkpoint
        # (trainer.py:333, reference train.py:439-444)
        max_epochs=max(epochs, 20), compute_dtype="float32", seed=seed)
    data = make_training_data(rng, n_train, size)
    models = work / "models"
    trainer = Trainer(cfg, models)
    trainer.fit(data)  # full protocol: writes the checkpoint + json sidecar
    return models / cfg.run_name


def train_tiny_boundary(work: Path, rng, size: int = 64, n_train: int = 8,
                        epochs: int = 30, filters=(8, 16), seed: int = 3,
                        normalization: str = "gn") -> Path:
    """Train a tiny 3-class 'U' boundary model (reference method #2:
    train.py:187 'boundary' + ce_dice); returns the checkpoint stem."""
    from microbeseg_tpu.config import ModelConfig, TrainConfig
    from microbeseg_tpu.training.trainer import Trainer

    cfg = TrainConfig(
        model=ModelConfig(unet_type="U", ch_out=3,
                          filters=tuple(filters), act_fun="relu",
                          normalization=normalization),
        label_type="boundary", loss="ce_dice",
        optimizer="adam", batch_size=4, run_name="parity_boundary_01",
        max_epochs=max(epochs, 20), compute_dtype="float32", seed=seed)
    data = make_training_data_boundary(rng, n_train, size)
    models = work / "models"
    Trainer(cfg, models).fit(data)
    return models / cfg.run_name


def to_reference_and_back(stem: Path, work: Path, label_type="distance"):
    """Our ckpt -> reference .pth (+json) -> reimported ckpt.  Returns
    (pth_path, reimported_stem, ModelConfig)."""
    from microbeseg_tpu.config import ModelConfig, read_sidecar
    from microbeseg_tpu.models.torch_import import (export_torch_checkpoint,
                                                    import_torch_checkpoint)

    pth = export_torch_checkpoint(stem, work / "reference_format")
    ckpt = import_torch_checkpoint(pth, work / "reimported")
    sidecar = read_sidecar(stem.parent / f"{stem.name}.json")
    mcfg = ModelConfig.from_architecture(sidecar["architecture"],
                                         label_type=label_type)
    return pth, ckpt.with_suffix(""), mcfg


def torch_net_from_pth(pth: Path, mcfg):
    import torch

    from tests.test_torch_import import _TorchDUNet, _TorchUNet

    cls = _TorchUNet if mcfg.unet_type == "U" else _TorchDUNet
    net = cls(ch_in=mcfg.ch_in, ch_out=mcfg.ch_out,
              pool=mcfg.pool_method, act=mcfg.act_fun,
              kind=mcfg.normalization, filters=mcfg.filters)
    net.load_state_dict(torch.load(pth, map_location="cpu"))
    return net.eval()


# ---------------------------------------------------------------------------
# The two chains
# ---------------------------------------------------------------------------

def reference_chain(net, frames: np.ndarray, th_seed: float,
                    th_cell: float) -> np.ndarray:
    """Reference per-frame loop (infer_script_local.py:117-161): normalize
    -> pad -> torch batch-1 forward -> crop pads -> oracle watershed."""
    import torch

    from microbeseg_tpu.utils.image import (min_max_normalization,
                                            zero_pad_model_input)
    from tests.oracles import distance_postprocessing_oracle

    masks = []
    with torch.no_grad():
        for frame in frames:
            # reference order: min/max on the UNPADDED frame, pad the RAW
            # frame with its minimum (local script semantics; the OMERO
            # script's raw-0 pad clips to the same -1 — PARITY.md), THEN
            # normalize.  Padding the normalized image with 0 instead
            # corrupts every pixel through GroupNorm's global statistics
            # (caught by the 192^2 gate run: IoU 0.5 everywhere).
            mn, mx = float(frame.min()), float(frame.max())
            padded, pads = zero_pad_model_input(frame.astype(np.float32),
                                                pad_val=mn)
            img = min_max_normalization(padded, mn, mx)
            border, cell = net(torch.from_numpy(img[None, None].copy()))
            border = border.numpy()[0, 0, pads[0]:, pads[1]:]
            cell = cell.numpy()[0, 0, pads[0]:, pads[1]:]
            masks.append(distance_postprocessing_oracle(
                border, cell, th_seed, th_cell))
    return np.stack(masks)


def reference_chain_boundary(net, frames: np.ndarray) -> np.ndarray:
    """Reference per-frame boundary loop: normalize -> pad -> torch batch-1
    forward -> channel softmax -> crop pads -> oracle boundary
    post-processing (reference postprocessing.py:62-90; no thresholds)."""
    import torch

    from microbeseg_tpu.utils.image import (min_max_normalization,
                                            zero_pad_model_input)
    from tests.oracles import boundary_postprocessing_oracle

    masks = []
    with torch.no_grad():
        for frame in frames:
            mn, mx = float(frame.min()), float(frame.max())
            padded, pads = zero_pad_model_input(frame.astype(np.float32),
                                                pad_val=mn)
            img = min_max_normalization(padded, mn, mx)
            logits = net(torch.from_numpy(img[None, None].copy()))
            probs = torch.softmax(logits, dim=1).numpy()[0]
            probs = probs[:, pads[0]:, pads[1]:]           # (3, H, W)
            masks.append(boundary_postprocessing_oracle(
                np.moveaxis(probs, 0, -1)))
    return np.stack(masks)


def engine_masks(stem: Path, frames: np.ndarray, dtype: str,
                 infer_cfg) -> np.ndarray:
    import jax.numpy as jnp

    from microbeseg_tpu.inference.engine import InferenceEngine
    from microbeseg_tpu.models.io import load_model

    model, variables, tcfg = load_model(Path(stem), dtype=jnp.dtype(dtype))
    eng = InferenceEngine(model, variables, tcfg.label_type, cfg=infer_cfg)
    return eng.segment(frames)


# ---------------------------------------------------------------------------
# The gate
# ---------------------------------------------------------------------------

def run_gate(work: Path, seed: int = 0, crop: int = 64, frame: int = 128,
             n_frames: int = 4, epochs: int = 30, filters=(8, 16),
             dtype: str = "float32", tile_size: int = 64,
             tile_overlap: int = 16, th_seed: float = 0.45,
             th_cell: float = 0.10, reuse: bool = False,
             normalization: str = "bn", tiled: bool = True) -> dict:
    """Train -> export -> reimport -> compare chains.  Returns per-variant
    per-frame IoUs plus instance counts (for the non-vacuity check)."""
    from microbeseg_tpu.config import InferConfig
    from tests.oracles import masks_iou

    if dtype == "float32":
        # XLA truncates f32 conv/matmul operands to bf16 at DEFAULT
        # precision — on the TPU MXU (CLAUDE.md incident 2026-08-19) AND on
        # AVX512-BF16 host CPUs (measured here 2026-08-20: flagship-chain
        # |flax32 - torch32| 0.053 at default, 4.4e-6 at highest; flax64
        # matches torch64 at 1.2e-7, so the model functions are identical).
        # The f32 gate must measure the ALGORITHM chain, not the intentional
        # production bf16 truncation — the bfloat16 dtype run quantifies
        # that separately.
        import jax
        jax.config.update("jax_default_matmul_precision", "highest")
    work = Path(work)
    rng = np.random.default_rng(seed)
    stem = work / "models" / "parity_model_01"
    if reuse and stem.with_suffix(".ckpt").exists():
        # reuse an existing trained checkpoint (e.g. the CPU-f32-trained one
        # for the on-chip bf16 engine probe) but REPLAY the training-data rng
        # draws so the gate frames stay the held-out continuation
        for _ in range(8):
            blob_sample(rng, crop)
    else:
        stem = train_tiny(work, rng, size=crop, epochs=epochs,
                          filters=filters, seed=seed + 3,
                          normalization=normalization)
    pth, reimported, mcfg = to_reference_and_back(stem, work)
    net = torch_net_from_pth(pth, mcfg)

    # gate frames: same distribution, DISJOINT from training (fresh rng draws)
    frames = np.stack(
        [blob_sample(rng, frame, n_blobs=14)[0] for _ in range(n_frames)])

    ref = reference_chain(net, frames, th_seed, th_cell)
    dense = engine_masks(reimported, frames, dtype,
                         InferConfig(th_cell=th_cell, th_seed=th_seed))
    out = {
        "n_instances_ref": [int(len(np.unique(m)) - 1) for m in ref],
        "iou_dense": [float(masks_iou(r, d)) for r, d in zip(ref, dense)],
        "dtype": dtype,
        "frames": list(frames.shape),
    }
    ious = list(out["iou_dense"])
    if tiled:
        tiled_m = engine_masks(reimported, frames, dtype,
                               InferConfig(th_cell=th_cell, th_seed=th_seed,
                                           use_tiling=True,
                                           tile_size=tile_size,
                                           tile_overlap=tile_overlap))
        out["iou_tiled"] = [float(masks_iou(r, t))
                            for r, t in zip(ref, tiled_m)]
        ious += out["iou_tiled"]
    out["min_iou"] = min(ious)
    out["mean_iou"] = float(np.mean(ious))
    return out


def run_gate_boundary(work: Path, seed: int = 0, crop: int = 64,
                      frame: int = 128, n_frames: int = 4,
                      epochs: int = 30, filters=(8, 16),
                      dtype: str = "float32",
                      normalization: str = "gn") -> dict:
    """Boundary-method composed gate (VERDICT r4 item 6): train a 3-class
    'U' model -> export .pth -> reimport -> torch+oracle chain vs full
    engine.segment.  No threshold grid (reference postprocessing.py:62-90);
    dense leg only."""
    from microbeseg_tpu.config import InferConfig
    from tests.oracles import masks_iou

    if dtype == "float32":
        import jax
        jax.config.update("jax_default_matmul_precision", "highest")
    work = Path(work)
    rng = np.random.default_rng(seed)
    stem = train_tiny_boundary(work, rng, size=crop, epochs=epochs,
                               filters=filters, seed=seed + 3,
                               normalization=normalization)
    pth, reimported, mcfg = to_reference_and_back(stem, work,
                                                  label_type="boundary")
    net = torch_net_from_pth(pth, mcfg)
    frames = np.stack(
        [blob_sample(rng, frame, n_blobs=14)[0] for _ in range(n_frames)])
    ref = reference_chain_boundary(net, frames)
    dense = engine_masks(reimported, frames, dtype, InferConfig())
    out = {
        "method": "boundary",
        "n_instances_ref": [int(len(np.unique(m)) - 1) for m in ref],
        "iou_dense": [float(masks_iou(r, d)) for r, d in zip(ref, dense)],
        "dtype": dtype,
        "frames": list(frames.shape),
    }
    out["min_iou"] = min(out["iou_dense"])
    out["mean_iou"] = float(np.mean(out["iou_dense"]))
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--work", default="/tmp/parity_gate")
    ap.add_argument("--dtype", default="bfloat16",
                    help="engine compute dtype (bfloat16 = the production "
                         "TPU path; float32 for CPU runs)")
    ap.add_argument("--frame", type=int, default=256)
    ap.add_argument("--n_frames", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--reuse", action="store_true",
                    help="reuse work/models/parity_model_01.ckpt instead of "
                         "training (on-chip probe over a CPU-trained ckpt)")
    ap.add_argument("--normalization", default="bn", choices=("bn", "gn"))
    ap.add_argument("--dense_only", action="store_true",
                    help="skip the tiled leg (the reference stubs sliding "
                         "windows, so tiled quality is measured against the "
                         "DENSE truth at production scale instead — "
                         "docs/PARITY.md)")
    ap.add_argument("--method", default="distance",
                    choices=("distance", "boundary"),
                    help="which reference method to gate (boundary: 3-class "
                         "'U' + boundary_postprocessing, dense leg only)")
    args = ap.parse_args()

    if args.method == "boundary":
        res = run_gate_boundary(Path(args.work), seed=args.seed,
                                frame=args.frame, n_frames=args.n_frames,
                                epochs=args.epochs, dtype=args.dtype,
                                normalization=args.normalization)
    else:
        res = run_gate(Path(args.work), seed=args.seed, frame=args.frame,
                       n_frames=args.n_frames, epochs=args.epochs,
                       dtype=args.dtype, tile_size=128, tile_overlap=32,
                       reuse=args.reuse, normalization=args.normalization,
                       tiled=not args.dense_only)
    res["pass"] = bool(res["min_iou"] >= 0.99
                       and all(n > 0 for n in res["n_instances_ref"]))
    print(json.dumps(res, indent=1))
    return 0 if res["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
