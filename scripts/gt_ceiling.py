"""Quantify the GT-noise ceiling of the real corpus (VERDICT r4 item 3).

The real C. glutamicum rows score against masks rasterized from the
reference tool's own outlines at 8-bit GIF resolution
(scripts/build_real_corpus.py).  Two questions bound what those scores
can mean:

  1. How much does the GT itself move under equally-defensible
     rasterization choices?  Rebuild the test-frame GT with each
     parameter perturbed one at a time (yellow chroma threshold 30 ->
     20/40, wall-assignment reach 3 -> 2/4 px, min area 25 -> 15/35)
     and report mean AJI+(baseline GT, variant GT) — the SELF-AGREEMENT
     of the annotation under re-rasterization.
  2. What does +-1 px of boundary uncertainty cost?  The outlines are
     1-2 px lines; erode / grow every instance by one pixel (growth via
     nearest-instance EDT, so touching cells never merge) and score
     against the baseline — the EXTREME bound for rods ~10 px wide.

Both bounds are then applied to the model row: the retrained model's
best-threshold predictions (saved by scripts/real_data_eval.py) are
re-scored against every GT variant, giving the spread of the headline
0.839 under GT noise.  Evaluation uses the same border correction as the
Evaluator (reference utils.py:25).

Pure CPU (~2 min): python scripts/gt_ceiling.py
  [--pred /tmp/real_eval2/eval/retrained/trainset_real_real_model_01]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np
from PIL import Image
from scipy import ndimage

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from scripts.build_real_corpus import outlines_to_instances  # noqa: E402

GIF = Path("/root/reference/doc/glutamicum.gif")
TEST_FRAMES = range(40, 50)


def restore_and_outline_th(rgb: np.ndarray, chroma_th: int):
    """scripts/build_real_corpus.restore_and_outline with a parameterized
    yellow chroma threshold."""
    a = rgb.astype(np.int32)
    yellow = ((a[..., 0] - a[..., 2] > chroma_th)
              & (a[..., 1] - a[..., 2] > chroma_th))
    img = a.mean(axis=-1)
    known = ~yellow
    while not known.all():
        s = ndimage.uniform_filter(np.where(known, img, 0.0), 3)
        c = ndimage.uniform_filter(known.astype(float), 3)
        fill = (c > 0) & ~known
        img[fill] = s[fill] / c[fill]
        known |= fill
    return np.clip(img, 0, 255).astype(np.uint8), yellow


def build_variant(chroma_th=30, min_area=25, max_reach=3.0):
    im = Image.open(GIF)
    masks = []
    for i in TEST_FRAMES:
        im.seek(i)
        rgb = np.asarray(im.convert("RGB"))
        img, yellow = restore_and_outline_th(rgb, chroma_th)
        masks.append(outlines_to_instances(yellow, img, min_area=min_area,
                                           max_reach=max_reach))
    return masks


def erode1(mask: np.ndarray) -> np.ndarray:
    """Per-instance 1 px erosion: a pixel survives only if its whole 3x3
    neighborhood carries the same label."""
    lo = ndimage.grey_erosion(mask, size=(3, 3))
    hi = ndimage.grey_dilation(mask, size=(3, 3))
    return np.where(lo == hi, mask, 0).astype(mask.dtype)


def grow1(mask: np.ndarray) -> np.ndarray:
    """Grow every instance 1 px into BACKGROUND via nearest-instance EDT
    (touching cells keep their shared wall; no merges)."""
    dist, (iy, ix) = ndimage.distance_transform_edt(mask == 0,
                                                    return_indices=True)
    out = mask.copy()
    sel = (mask == 0) & (dist <= 1.5)
    out[sel] = mask[iy[sel], ix[sel]]
    return out


def mean_aji(a_list, b_list, border: int = 10) -> float:
    from microbeseg_tpu.evaluation.metrics import get_fast_aji_plus
    from microbeseg_tpu.utils.image import border_correction
    vals = [get_fast_aji_plus(border_correction(a, border),
                              border_correction(b, border))
            for a, b in zip(a_list, b_list)]
    return float(np.mean(vals))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pred", default="/tmp/real_eval2/eval/retrained/"
                                     "trainset_real_real_model_01",
                   help="directory of best-threshold predicted masks "
                        "(mask_40..49.tif) to re-score against each "
                        "GT variant; skipped if absent")
    args = p.parse_args(argv)
    from microbeseg_tpu.utils.tiff import imread_page

    base = build_variant()
    variants = {
        "chroma_20": dict(chroma_th=20),
        "chroma_40": dict(chroma_th=40),
        "reach_2": dict(max_reach=2.0),
        "reach_4": dict(max_reach=4.0),
        "area_15": dict(min_area=15),
        "area_35": dict(min_area=35),
    }
    report = {"frames": list(TEST_FRAMES), "gt_self_agreement": {},
              "boundary_bounds": {}}
    for name, kw in variants.items():
        report["gt_self_agreement"][name] = round(
            mean_aji(base, build_variant(**kw)), 4)
    report["boundary_bounds"]["erode_1px"] = round(
        mean_aji(base, [erode1(m) for m in base]), 4)
    report["boundary_bounds"]["grow_1px"] = round(
        mean_aji(base, [grow1(m) for m in base]), 4)
    agree = list(report["gt_self_agreement"].values())
    report["gt_self_agreement_min"] = min(agree)

    pred_dir = Path(args.pred)
    preds = [pred_dir / f"mask_{i}.tif" for i in TEST_FRAMES]
    if all(p.exists() for p in preds):
        pred_masks = [imread_page(p, 0) for p in preds]
        scores = {"baseline": round(mean_aji(base, pred_masks), 4)}
        for name, kw in variants.items():
            scores[name] = round(
                mean_aji(build_variant(**kw), pred_masks), 4)
        vals = list(scores.values())
        scores["spread"] = round(max(vals) - min(vals), 4)
        report["model_vs_gt_variants"] = scores

    print(json.dumps(report, indent=1))
    Path("/tmp/gt_ceiling.json").write_text(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
