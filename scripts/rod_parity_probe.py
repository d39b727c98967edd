"""Root-cause probe for the rod/chain quality gap (docs/E2E_RESULTS.md).

Question: is the rod AJI+ gap (0.73-0.77 vs 0.88 for ellipses) a parity
problem in OUR post-processing (quantized/Pallas flood, on-device seed
extraction) or inherent to the reference's neighbor-distance formulation on
touching end-to-end chains?

Method: load the trained rod model (train first via
``python examples/e2e_demo.py --shape rods --epochs 60 --crop_size 256
--out _rod_probe``), compute raw CNN predictions ONCE per test image, then
run the full evaluation threshold grid through
  (a) our on-device ``distance_postprocessing_grid`` and
  (b) the reference-algorithm oracle (tests/oracles.py: scipy gaussian,
      skimage-semantics label/watershed, exact heap flooding)
and score both against ground truth with the evaluator's exact protocol
(border correction + AJI+, reference eval.py:223-327).  If (a) == (b), the
gap is in the CNN/labels/task, not our kernels.  Also reports error-mode
diagnostics (PQ-style detections, merges, splits) at the best threshold.

Run: JAX_PLATFORMS=axon python scripts/rod_parity_probe.py [--out _rod_probe]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

from microbeseg_tpu.config import EvalConfig, InferConfig
from microbeseg_tpu.evaluation.metrics import get_fast_aji_plus, remap_label
from microbeseg_tpu.inference.engine import InferenceEngine
from microbeseg_tpu.utils.image import border_correction
from microbeseg_tpu.utils.tiff import imread

from oracles import distance_postprocessing_oracle  # noqa: E402


def score(pred: np.ndarray, gt: np.ndarray, border_width: int) -> float:
    pred = border_correction(pred, border_width)
    gt = border_correction(gt, border_width)
    if pred.max() == 0:
        return 0.0
    return get_fast_aji_plus(remap_label(gt), remap_label(pred))


def error_modes(pred: np.ndarray, gt: np.ndarray):
    """Instance-level detection stats at IoU>0.5 (PQ matching rule)."""
    gt = remap_label(gt)
    pred = remap_label(pred)
    n_gt, n_pred = gt.max(), pred.max()
    matched_gt, matched_pred = set(), set()
    # sparse contingency
    fg = (gt > 0) | (pred > 0)
    pairs, counts = np.unique(
        np.stack([gt[fg], pred[fg]]), axis=1, return_counts=True)
    areas_gt = np.bincount(gt.ravel(), minlength=n_gt + 1)
    areas_pred = np.bincount(pred.ravel(), minlength=n_pred + 1)
    # overlap census per gt: how many preds overlap it non-trivially (split
    # indicator), and per pred: how many gts (merge indicator)
    overlaps_per_gt = {}
    overlaps_per_pred = {}
    for (g, p), c in zip(pairs.T, counts):
        if g == 0 or p == 0:
            continue
        iou = c / (areas_gt[g] + areas_pred[p] - c)
        if iou > 0.5:
            matched_gt.add(int(g))
            matched_pred.add(int(p))
        if c > 0.25 * areas_pred[p]:
            overlaps_per_gt.setdefault(int(g), []).append(int(p))
        if c > 0.25 * areas_gt[g]:
            overlaps_per_pred.setdefault(int(p), []).append(int(g))
    splits = sum(1 for g, ps in overlaps_per_gt.items() if len(ps) >= 2)
    merges = sum(1 for p, gs in overlaps_per_pred.items() if len(gs) >= 2)
    return {
        "n_gt": int(n_gt), "n_pred": int(n_pred),
        "tp": len(matched_gt),
        "missed": int(n_gt) - len(matched_gt),
        "spurious": int(n_pred) - len(matched_pred),
        "gt_split_into_2plus": splits,
        "pred_merging_2plus": merges,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="_rod_probe")
    parser.add_argument("--model", default="distance_model_01")
    args = parser.parse_args()

    out = Path(__file__).resolve().parents[1] / args.out
    test_dir = out / "trainset" / "test"
    model_dir = out / "models" / args.model
    assert test_dir.is_dir() and model_dir.with_suffix(".json").exists(), (
        "run examples/e2e_demo.py --shape rods --out _rod_probe first")

    engine = InferenceEngine.from_checkpoint(model_dir, cfg=InferConfig())
    ecfg = EvalConfig()
    ths = [(tc, ts) for tc in ecfg.th_cells
           for ts in ecfg.th_seeds]  # reference grid eval.py:128
    bw = ecfg.border_width

    import jax.numpy as jnp

    from microbeseg_tpu.ops.postprocessing import distance_postprocessing_grid

    rows = []
    diags = {"device": [], "oracle": []}
    for img_path in sorted(test_dir.glob("img*.tif")):
        gt = imread(test_dir / img_path.name.replace("img", "mask"))
        img = imread(img_path)
        border, cell = (np.asarray(p[0])
                        for p in engine.predict_raw(img[None]))
        masks_dev = np.asarray(distance_postprocessing_grid(
            jnp.asarray(border), jnp.asarray(cell),
            np.asarray(ths, np.float32)))
        for (th_cell, th_seed), m_dev in zip(ths, masks_dev):
            m_orc = distance_postprocessing_oracle(
                border, cell, th_seed=th_seed, th_cell=th_cell)
            rows.append({
                "img": img_path.stem, "th_cell": th_cell, "th_seed": th_seed,
                "aji_device": score(m_dev.astype(np.uint16), gt, bw),
                "aji_oracle": score(m_orc, gt, bw),
            })
            if (th_cell, th_seed) == (0.10, 0.45):
                diags["device"].append(error_modes(
                    border_correction(m_dev.astype(np.uint16), bw),
                    border_correction(gt, bw)))
                diags["oracle"].append(error_modes(
                    border_correction(m_orc, bw),
                    border_correction(gt, bw)))

    import pandas as pd
    df = pd.DataFrame(rows)
    by_th = df.groupby(["th_cell", "th_seed"])[
        ["aji_device", "aji_oracle"]].mean()
    print("\nMean AJI+ per threshold (device postproc vs reference oracle):")
    print(by_th.to_string())
    best_dev = by_th["aji_device"].max()
    best_orc = by_th["aji_oracle"].max()
    print(f"\nbest-threshold mean AJI+: device {best_dev:.4f} "
          f"oracle {best_orc:.4f} (delta {best_dev - best_orc:+.4f})")

    def agg(ds):
        keys = ds[0].keys()
        return {k: int(np.sum([d[k] for d in ds])) for k in keys}
    print("\nError modes at th=(0.10, 0.45), summed over test images:")
    print("  device:", json.dumps(agg(diags["device"])))
    print("  oracle:", json.dumps(agg(diags["oracle"])))


if __name__ == "__main__":
    main()
