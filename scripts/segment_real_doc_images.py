"""Qualitative real-microscopy evidence from the reference's own docs.

The environment has no network, so the Zenodo datasets behind the
reference's paper are unreachable and all quantitative quality evidence
is synthetic (docs/E2E_RESULTS.md).  The reference repository DOES ship
real C. glutamicum phase-contrast pixels inside its documentation
screenshots (/root/reference/doc/pre-labeling.png: three 320^2 crops of
"experiment 02 / WT_1h_15.tif" rendered 1:1).  This script recovers them
and runs our synthetic-trained models over REAL microscopy:

- crop 1 (dense colony, ~100 rod cells) carries the reference's yellow
  pre-label outlines; off-overlay pixels are exactly grayscale (max
  channel deviation 0), so the 6.1% of outline pixels are identified by
  R-B chroma and inpainted from their 3x3 neighborhood — a faithful
  restoration everywhere except under the 1-2 px lines themselves.
- crop 3 (microfluidic channel with a band of tiny cells) is clean.

Phase-contrast C. glutamicum is dark-on-gray with bright halos; the
synthetic corpus trains bright-on-dark, so frames are intensity-inverted
before segmentation (a polarity convention, not a model retrain).

Usage:
  python scripts/segment_real_doc_images.py --model _scale_rods/models/trainset256/distance_model_01 \
      --out docs/assets/real

Writes {name}.png (restored input), {name}_mask.png (color instance
map), {name}_overlay.png (outlines) and prints instance counts.  This is
QUALITATIVE evidence only — no ground truth exists for these pixels.
"""

import argparse
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DOC = Path("/root/reference/doc/pre-labeling.png")
PANELS = {  # y0:y1, x0:x1 panel regions of the 1:1 screenshot
    "colony": (slice(143, 463), slice(18, 336)),
    "channel": (slice(143, 463), slice(680, 998)),
}


def restore_panel(rgb: np.ndarray, name: str) -> np.ndarray:
    from scipy import ndimage

    ys, xs = PANELS[name]
    panel = rgb[ys, xs].astype(np.int32)
    r, g, b = panel[..., 0], panel[..., 1], panel[..., 2]
    overlay = (r - b > 30) & (g - b > 30)  # the yellow pre-label outlines
    img = panel.mean(axis=-1)
    known = ~overlay
    while not known.all():
        s = ndimage.uniform_filter(np.where(known, img, 0.0), 3)
        c = ndimage.uniform_filter(known.astype(float), 3)
        fill = (c > 0) & ~known
        img[fill] = s[fill] / c[fill]
        known |= fill
    return np.clip(img, 0, 255).astype(np.uint8)


def color_mask(mask: np.ndarray) -> np.ndarray:
    rng = np.random.default_rng(0)
    lut = rng.integers(60, 255, (int(mask.max()) + 1, 3), dtype=np.uint8)
    lut[0] = 0
    return lut[mask]


def overlay_outlines(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    from scipy import ndimage

    eroded = ndimage.grey_erosion(mask, size=(3, 3))
    outline = (mask != eroded) & (mask > 0)
    out = np.stack([img] * 3, axis=-1)
    out[outline] = (255, 220, 0)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", "-m", required=True, nargs="+")
    p.add_argument("--out", default="docs/assets/real")
    p.add_argument("--thresholds", type=float, nargs=2, default=[0.10, 0.45])
    p.add_argument("--tta", action="store_true")
    args = p.parse_args(argv)

    from microbeseg_tpu.cli.infer_local import build_engine
    from microbeseg_tpu.config import InferConfig

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    engine = build_engine(args.model, InferConfig(
        th_cell=args.thresholds[0], th_seed=args.thresholds[1],
        tta=args.tta))

    rgb = np.asarray(Image.open(DOC).convert("RGB"))
    for name in PANELS:
        img = restore_panel(rgb, name)
        inv = (255 - img).astype(np.uint16) * 257  # bright cells, uint16
        mask = engine.segment(inv)
        n = int(mask.max())
        print(f"{name}: {n} instances")
        Image.fromarray(img).save(out_dir / f"{name}.png")
        Image.fromarray(color_mask(mask)).save(out_dir / f"{name}_mask.png")
        Image.fromarray(overlay_outlines(img, mask)).save(
            out_dir / f"{name}_overlay.png")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
