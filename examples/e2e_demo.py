"""End-to-end demo on real hardware: synthetic trainset -> distance labels ->
Ranger training -> AJI+ threshold-grid evaluation -> 2D+t tiled inference.

Writes artifacts under ./_e2e_out (gitignored); prints a summary.
Run: python examples/e2e_demo.py [--epochs N]
"""

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from microbeseg_tpu.config import EvalConfig, InferConfig, ModelConfig, TrainConfig
from microbeseg_tpu.evaluation.evaluator import Evaluator
from microbeseg_tpu.inference.engine import InferenceEngine
from microbeseg_tpu.training.data import TrainingData
from microbeseg_tpu.training.trainer import Trainer
from microbeseg_tpu.training.workers import create_labels
from microbeseg_tpu.utils.tiff import imwrite


def synth_sample(rng, size=128, n_blobs=10, shape="ellipse", illum=0.0,
                 noise=1.0):
    """Synthetic microscopy-like crop: bright cells + noise.

    ``shape='ellipse'`` places axis-aligned ellipses (round cocci-like
    cells); ``shape='rods'`` places rotated capsules that frequently
    continue into touching end-to-end chains — the morphology of the
    rod-shaped bacteria (E. coli / B. subtilis) the reference targets,
    and the hard case for neighbor-distance separation of touching cells
    (reference train_data_representations.py:300-330); ``shape='mixed'``
    draws each cell group as rods or ellipses at random (mixed cultures).

    ``illum`` adds uneven illumination: a random linear-gradient + center
    vignette field multiplies the frame down to ``1 - illum`` of full
    brightness (microscopy shading).  ``noise`` scales the additive
    gaussian read noise (SNR stress)."""
    yy, xx = np.mgrid[0:size, 0:size]
    mask = np.zeros((size, size), np.uint16)
    img = rng.normal(6000, 300, (size, size))
    label = 0

    def place(d_norm, blob):
        nonlocal label
        if not blob.any() or (mask[blob] > 0).mean() > 0.2:
            return False
        label += 1
        mask[blob & (mask == 0)] = label
        img[...] += np.where(blob, 25000 * np.clip(1.2 - d_norm, 0, 1.2), 0)
        return True

    def capsule(cy, cx, theta, half, r):
        """Normalized distance field of a capsule (segment dilated by r)."""
        uy, ux = np.cos(theta), np.sin(theta)
        t = np.clip((yy - cy) * uy + (xx - cx) * ux, -half, half)
        d = np.hypot(yy - cy - t * uy, xx - cx - t * ux) / r
        return d

    for _group in range(n_blobs):
        kind = shape
        if shape == "mixed":
            kind = "rods" if rng.random() < 0.5 else "ellipse"
        if kind == "rods":
            r = rng.integers(3, 6)
            half = rng.integers(6, 16)  # centerline half-length
            theta = rng.uniform(0, np.pi)
            cy = rng.integers(half + r + 1, size - half - r - 1)
            cx = rng.integers(half + r + 1, size - half - r - 1)
            links = 1 + (rng.random() < 0.5) + (rng.random() < 0.25)
            for _ in range(links):  # end-to-end chain of touching rods
                d = capsule(cy, cx, theta, half, r)
                place(d, d <= 1)
                theta2 = theta + rng.uniform(-0.35, 0.35)
                step = half + r  # tip of this rod = tip of the next: touching
                cy = cy + int(round(step * np.cos(theta) +
                                    (half + r) * np.cos(theta2)))
                cx = cx + int(round(step * np.sin(theta) +
                                    (half + r) * np.sin(theta2)))
                theta = theta2
                lim_y = half + r + 1
                if not (lim_y <= cy < size - lim_y and
                        lim_y <= cx < size - lim_y):
                    break
        else:
            ry, rx = rng.integers(6, 14, 2)
            cy = rng.integers(ry + 2, size - ry - 2)
            cx = rng.integers(rx + 2, size - rx - 2)
            d = np.sqrt(((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2)
            place(d, d <= 1)
    if illum > 0:
        # random linear gradient + center vignette, scaled into [1-illum, 1]
        gy, gx = rng.uniform(-1, 1, 2)
        field = gy * (yy / size - 0.5) + gx * (xx / size - 0.5)
        field = field - rng.uniform(0.5, 1.5) * (
            ((yy / size - 0.5) ** 2 + (xx / size - 0.5) ** 2))
        lo, hi = field.min(), field.max()
        field = (field - lo) / max(hi - lo, 1e-9)          # [0, 1]
        img = img * (1.0 - illum + illum * field)
    img = img + rng.normal(0, 400 * noise, img.shape)
    # trainset crops are full-range uint16 (the reference's export
    # renormalizes with stored min/max, data_export.py:99-101; training then
    # normalizes by 0..65535 while inference normalizes per frame)
    img = (img - img.min()) / (img.max() - img.min()) * 65535
    return img.astype(np.uint16), mask


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--n_train", type=int, default=24)
    parser.add_argument("--crop_size", type=int, default=128,
                        help="trainset crop size (reference recommends "
                             "256/320; blob count scales with area)")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--filters", default="16,128",
                        help="encoder filter range f0,f1 (flagship: 64,1024"
                             " — the reference default, unets.py:320-331)")
    parser.add_argument("--method", default="distance",
                        choices=("distance", "boundary"),
                        help="label/method family (boundary = the 3-class "
                             "baseline, reference train.py)")
    parser.add_argument("--shape", default="ellipse",
                        choices=("ellipse", "rods", "mixed"),
                        help="synthetic cell morphology: round cocci-like "
                             "ellipses, rotated rod/chain capsules, or a "
                             "per-group random mix (mixed cultures)")
    parser.add_argument("--illum", type=float, default=0.0,
                        help="uneven-illumination stress: random gradient+"
                             "vignette field dimming the frame down to "
                             "(1-illum) of full brightness (try 0.6)")
    parser.add_argument("--noise", type=float, default=1.0,
                        help="read-noise multiplier (SNR stress; 1.0 = the "
                             "standard sigma-400 corpus)")
    parser.add_argument("--normalization", default="gn",
                        choices=("bn", "gn", "in"),
                        help="'bn' is the reference default "
                             "(src/training/train.py:187)")
    parser.add_argument("--th_seeds", type=float, nargs="+", default=None,
                        help="override the evaluation seed-threshold grid "
                             "(reference default 0.35 0.45; rod chains "
                             "separate best at 0.55-0.75, see "
                             "docs/E2E_RESULTS.md)")
    parser.add_argument("--tta", default=False, action="store_true",
                        help="test-time augmentation (dihedral-averaged "
                             "predictions) in evaluation and inference")
    parser.add_argument("--out", default=None,
                        help="output dir (default: repo/_e2e_out)")
    args = parser.parse_args()

    out = (Path(args.out) if args.out
           else Path(__file__).resolve().parents[1] / "_e2e_out")
    shutil.rmtree(out, ignore_errors=True)
    data_dir = out / "trainset"
    models_dir = out / "models"
    rng = np.random.default_rng(7)

    # 1. synthetic trainset
    cs = args.crop_size
    n_blobs = max(4, int(10 * (cs / 128) ** 2))
    for split, n in (("train", args.n_train),
                     ("val", max(6, args.n_train // 4)),
                     ("test", max(4, args.n_train // 6))):
        (data_dir / split).mkdir(parents=True)
        for i in range(n):
            img, mask = synth_sample(rng, size=cs, n_blobs=n_blobs,
                                     shape=args.shape, illum=args.illum,
                                     noise=args.noise)
            imwrite(data_dir / split / f"img_{split}{i:02d}.tif", img)
            imwrite(data_dir / split / f"mask_{split}{i:02d}.tif", mask)
    print("trainset written", flush=True)

    # 2. labels
    t0 = time.time()
    assert create_labels(data_dir, args.method, text_output=print)
    print(f"labels done in {time.time() - t0:.1f}s", flush=True)

    # 3. train
    run_name = f"{args.method}_model_01"
    filters = tuple(int(f) for f in args.filters.split(","))
    cfg = TrainConfig(model=ModelConfig(
                          unet_type="DU" if args.method == "distance" else "U",
                          ch_out=1 if args.method == "distance" else 3,
                          filters=filters, act_fun="mish",
                          normalization=args.normalization),
                      label_type=args.method,
                      loss="smooth_l1" if args.method == "distance"
                           else "ce_dice",
                      optimizer="ranger", batch_size=args.batch_size,
                      run_name=run_name, max_epochs=args.epochs)
    data = TrainingData.from_directory(data_dir, label_type=args.method)
    t0 = time.time()
    trainer = Trainer(cfg, models_dir, text_output=print)
    best = trainer.fit(data, print_output=False)
    print(f"training done in {time.time() - t0:.1f}s, best val loss {best:.4f}",
          flush=True)

    # 4. evaluate (AJI+ threshold grid)
    ecfg = EvalConfig(tta=args.tta)
    if args.th_seeds:
        import dataclasses
        ecfg = dataclasses.replace(ecfg, th_seeds=tuple(args.th_seeds))
    ev = Evaluator(ecfg, text_output=print)
    df = ev.evaluate(data_dir, out / "evaluation" / "trainset",
                     [models_dir / run_name])
    print(df.to_string(index=False), flush=True)

    # 5. 2D+t stack inference with tiling
    stack = np.stack([synth_sample(rng, size=400, n_blobs=60,
                                   shape=args.shape, illum=args.illum,
                                   noise=args.noise)[0]
                      for _ in range(4)])
    engine = InferenceEngine.from_checkpoint(
        models_dir / run_name,
        cfg=InferConfig(use_tiling=True, tile_size=256, tile_overlap=64,
                        tta=args.tta))
    t0 = time.time()
    masks = engine.segment(stack)
    n_cells = [int(len(np.unique(m)) - 1) for m in masks]
    print(f"2D+t tiled inference: {stack.shape} in {time.time() - t0:.1f}s, "
          f"cells/frame {n_cells}", flush=True)
    imwrite(out / "stack_masks.tif", masks)

    summary = {
        "best_val_loss": float(best),
        "aji_mean": float(df.iloc[0]["aji+ (mean)"]),
        "th_cell": float(df.iloc[0]["th_cell"]),
        "th_seed": float(df.iloc[0]["th_seed"]),
        "stack_cells_per_frame": n_cells,
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print("SUMMARY", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
