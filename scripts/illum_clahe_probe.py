"""Does inference-time CLAHE help under uneven illumination?

The reference exposes CLAHE as an inference pre-processing option
(inference_dataset.py:43-140) but never evaluates it; our engine implements
it on device (`InferConfig.apply_clahe`).  This probe scores the stressed
illumination corpus (train via ``python examples/e2e_demo.py --shape mixed
--illum 0.6 --noise 2.0 --out _stress_hard``) with CLAHE off vs on at the
model's best evaluated thresholds.

Run: JAX_PLATFORMS=axon python scripts/illum_clahe_probe.py [--out _stress_hard]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from microbeseg_tpu.config import InferConfig
from microbeseg_tpu.evaluation.metrics import get_fast_aji_plus, remap_label
from microbeseg_tpu.inference.engine import InferenceEngine
from microbeseg_tpu.utils.image import border_correction
from microbeseg_tpu.utils.tiff import imread


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="_stress_hard")
    parser.add_argument("--model", default="distance_model_01")
    args = parser.parse_args()

    out = Path(__file__).resolve().parents[1] / args.out
    test_dir = out / "trainset" / "test"
    summary = json.loads((out / "summary.json").read_text())
    th_cell, th_seed = summary["th_cell"], summary["th_seed"]
    print(f"thresholds from eval: th_cell {th_cell} th_seed {th_seed}")

    for clahe in (False, True):
        engine = InferenceEngine.from_checkpoint(
            out / "models" / args.model,
            cfg=InferConfig(th_cell=th_cell, th_seed=th_seed,
                            apply_clahe=clahe))
        scores = []
        for img_path in sorted(test_dir.glob("img*.tif")):
            gt = imread(test_dir / img_path.name.replace("img", "mask"))
            mask = engine.segment(imread(img_path)[None])[0]
            pred = border_correction(mask.astype(np.uint16), 10)
            gt_c = border_correction(gt, 10)
            scores.append(get_fast_aji_plus(remap_label(gt_c),
                                            remap_label(pred))
                          if pred.max() else 0.0)
        print(f"CLAHE {'on ' if clahe else 'off'}: AJI+ "
              f"{np.mean(scores):.4f} ± {np.std(scores):.4f}  "
              f"(n={len(scores)})")


if __name__ == "__main__":
    main()
