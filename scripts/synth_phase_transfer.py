"""Domain-matched synthetic -> REAL zero-shot transfer (beyond reference).

docs/E2E_RESULTS.md's real-microscopy row showed the bright-cell synthetic
corpus does not transfer zero-shot to phase contrast (AJI+ 0.033).  This
experiment asks the practical follow-up: can the synthesizer be
domain-matched so a model trained on PURELY SYNTHETIC data segments real
phase-contrast colonies with no annotation at all?

The renderer reproduces the measured structure of the real corpus
(scripts/build_real_corpus.py images): background ~140 of 255 with mild
shading, rod cells only ~22 gray levels DARKER than background with
darker interiors, and the phase-contrast signature — a bright halo ring
(~+70, p90 +100) hugging every cell exterior so dense interstices fill
with halo; gaussian PSF blur and read noise on top.  Masks come from
capsule-chain colony growth (touching rods, the hard case).

Protocol: train the flagship config on rendered frames (labels via the
device label-gen from the synthetic masks), then evaluate ZERO-SHOT on
the real test frames (40-49, raw polarity — no inversion, the model sees
real phase contrast exactly as uploaded).  Compare against the 0.033
bright-cell zero-shot row and the 0.839 trained-on-real ceiling.

Run ON THE CHIP (~25 min): python scripts/synth_phase_transfer.py
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

import numpy as np
from scipy import ndimage

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

CORPUS = ROOT / "data" / "real_glutamicum"
TEST_FRAMES = range(40, 50)


def colony_mask(rng, size: int, n_cells: int) -> np.ndarray:
    """Packed colony of touching rod cells grown from a seed point."""
    yy, xx = np.mgrid[0:size, 0:size]
    mask = np.zeros((size, size), np.uint16)

    def capsule(cy, cx, theta, half, r):
        uy, ux = np.cos(theta), np.sin(theta)
        t = np.clip((yy - cy) * uy + (xx - cx) * ux, -half, half)
        return np.hypot(yy - cy - t * uy, xx - cx - t * ux) <= r

    cy0, cx0 = size // 2 + rng.integers(-size // 8, size // 8, 2)
    label = 0
    anchors = [(float(cy0), float(cx0))]
    attempts = 0
    while label < n_cells and attempts < n_cells * 30:
        attempts += 1
        ay, ax = anchors[rng.integers(len(anchors))]
        # grow adjacent to an existing cell: small offset from an anchor
        dist = rng.uniform(0, 14)
        ang = rng.uniform(0, 2 * np.pi)
        cy = ay + dist * np.cos(ang)
        cx = ax + dist * np.sin(ang)
        r = rng.integers(3, 5)
        half = rng.integers(3, 9)
        theta = rng.uniform(0, np.pi)
        lim = half + r + 1
        if not (lim <= cy < size - lim and lim <= cx < size - lim):
            continue
        blob = capsule(cy, cx, theta, half, r)
        if (mask[blob] > 0).mean() > 0.25:
            continue
        label += 1
        mask[blob & (mask == 0)] = label
        anchors.append((cy, cx))
    return mask


def render_phase_contrast(rng, mask: np.ndarray,
                          randomize: bool = False) -> np.ndarray:
    """Mask -> phase-contrast-style uint16 frame (measured real statistics:
    bg ~140, cells bg-22 with darker interiors, halo ring ~+70 decaying
    over ~3 px, PSF blur, read noise, mild shading).

    ``randomize=True`` = DOMAIN RANDOMIZATION: every appearance parameter
    is drawn per frame from a wide range instead of the calibrated point
    estimate — the standard remedy when point-matched synthesis transfers
    poorly (the v3 'better-calibrated' renderer measured WORSE than v1,
    docs/E2E_RESULTS.md)."""
    size = mask.shape[0]
    yy, xx = np.mgrid[0:size, 0:size]
    if randomize:
        bg = rng.uniform(110, 170)
        shade = rng.uniform(2, 20)
        depth_base = rng.uniform(8, 35)
        depth_slope = rng.uniform(0, 8)
        halo_amp = rng.uniform(30, 120)
        halo_width = rng.uniform(1.2, 6.0)
        wall_amp = rng.uniform(0, 70)
        blur = rng.uniform(0.5, 1.8)
        noise = rng.uniform(1.5, 6.0)
    else:
        bg = 140.0 + rng.uniform(-6, 6)
        shade = 8.0
        depth_base, depth_slope = 16.0, 4.0
        halo_amp, halo_width = 90.0, 2.5
        wall_amp = 0.0
        blur, noise = 0.8, 3.5
    img = np.full(mask.shape, bg, np.float64)
    # colony shading (real frames: bg std grows to ~18 when dense)
    gy, gx = rng.uniform(-1, 1, 2)
    img += shade * (gy * (yy / size - 0.5) + gx * (xx / size - 0.5))
    cells = mask > 0
    depth = ndimage.distance_transform_edt(cells)
    img -= np.where(cells, depth_base + depth_slope * np.clip(depth, 0, 3),
                    0.0)
    # phase halo: bright ring on the OUTSIDE — dense interstices fill with
    # halo (the real corpus' failure mode for the bright-cell model)
    d_out = ndimage.distance_transform_edt(~cells)
    img += np.where(~cells,
                    halo_amp * np.exp(-(d_out - 1.0) ** 2 / halo_width), 0.0)
    if wall_amp > 0:
        lo = ndimage.grey_erosion(mask, size=(3, 3))
        hi = ndimage.grey_dilation(mask, size=(3, 3))
        wall = cells & (hi != lo) & (lo > 0)
        img += np.where(ndimage.binary_dilation(wall), wall_amp, 0.0)
    img = ndimage.gaussian_filter(img, blur)
    img += rng.normal(0, noise, img.shape)
    return (np.clip(img, 0, 255) * 257).astype(np.uint16)


def build_trainset(out: Path, rng, n_train: int, n_val: int,
                   size: int, randomize: bool = False) -> Path:
    from microbeseg_tpu.utils.tiff import imwrite

    trainset = out / "trainset_synthpc"
    for split, n in (("train", n_train), ("val", n_val)):
        (trainset / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            # density sweep: sparse micro-colonies to packed colonies
            n_cells = int(rng.integers(6, 220))
            mask = colony_mask(rng, size, n_cells)
            img = render_phase_contrast(rng, mask, randomize=randomize)
            imwrite(trainset / split / f"img_{i:03d}.tif", img)
            imwrite(trainset / split / f"mask_{i:03d}.tif", mask)
    return trainset


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--n_train", type=int, default=32)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--out", default="/tmp/synthpc")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--randomize", action="store_true",
                   help="domain-randomized appearance instead of the "
                        "calibrated point estimate")
    args = p.parse_args(argv)

    from microbeseg_tpu.config import EvalConfig, ModelConfig, TrainConfig
    from microbeseg_tpu.evaluation.evaluator import Evaluator
    from microbeseg_tpu.training.data import TrainingData
    from microbeseg_tpu.training.trainer import Trainer
    from microbeseg_tpu.training.workers import create_labels
    from microbeseg_tpu.utils.tiff import imread_page, imwrite

    out = Path(args.out)
    if out.exists():
        shutil.rmtree(out)
    rng = np.random.default_rng(args.seed)
    trainset = build_trainset(out, rng, args.n_train, max(args.n_train // 4, 4),
                              args.size, randomize=args.randomize)
    # the REAL corpus test frames, raw polarity, as the eval test split
    (trainset / "test").mkdir(exist_ok=True)
    for i in TEST_FRAMES:
        imwrite(trainset / "test" / f"img_{i:02d}.tif",
                imread_page(CORPUS / f"img_{i:02d}.tif", 0))
        imwrite(trainset / "test" / f"mask_{i:02d}.tif",
                imread_page(CORPUS / f"mask_{i:02d}.tif", 0))

    if not create_labels(trainset, "distance", text_output=print):
        raise RuntimeError("label generation failed")
    cfg = TrainConfig(model=ModelConfig(act_fun="mish", normalization="gn"),
                      optimizer="ranger", batch_size=8,
                      run_name="synthpc_model_01",
                      max_epochs=max(args.epochs, 20))
    models = out / "models" / "trainset_synthpc"
    Trainer(cfg, models, text_output=print).fit(
        TrainingData.from_directory(trainset, "distance"))

    ev = Evaluator(EvalConfig(th_seeds=(0.35, 0.45, 0.55, 0.65, 0.75)),
                   text_output=print)
    df = ev.evaluate(trainset, out / "eval", [models / cfg.run_name])
    best = df.sort_values("aji+ (mean)", ascending=False).iloc[0]
    report = {"zero_shot_synthpc_on_real": {
        "aji_mean": float(best["aji+ (mean)"]),
        "aji_std": float(best["aji+ (std)"]),
        "th_cell": float(best["th_cell"]),
        "th_seed": float(best["th_seed"])}}
    print(json.dumps(report, indent=1))
    (out / "report.json").write_text(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
