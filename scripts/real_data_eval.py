"""Quantitative REAL-microscopy evaluation row (VERDICT r3 item 5).

Uses the real C. glutamicum corpus built by scripts/build_real_corpus.py
(50-frame phase-contrast time-lapse recovered from the reference's docs;
GT = the reference tool's own published segmentation outlines rasterized
to instances).  Two rows, the product's own workflow:

  A. zero-shot: a synthetic-trained flagship model evaluated on the real
     test frames (threshold-grid AJI+ via the Evaluator, the reference
     eval protocol eval.py:127-131 + border correction utils.py:25);
  B. adapted: the pre-label -> correct -> retrain loop on real pixels —
     train a model ON the real train split (labels generated from the
     corrected annotation by ops/labelgen), evaluate on the same test
     frames.

Split is TIME-DISJOINT (train 0-34, val 35-39, test 40-49: the densest
colony stages are the held-out end of the movie).  Honest caveats: the GT
inherits the reference segmentation's quality at 8-bit GIF resolution, and
frames of one growing colony are temporally correlated — AJI+ std over the
10 test frames understates independent-sample variance.

Run ON THE CHIP (~20 min incl. training):
  python scripts/real_data_eval.py [--model _scale_flagship/models/trainset256/distance_model_01]
      [--epochs 60] [--out /tmp/real_eval]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

CORPUS = ROOT / "data" / "real_glutamicum"
SPLITS = {"train": range(0, 35), "val": range(35, 40), "test": range(40, 50)}


def stage_corpus(out: Path) -> Path:
    """Copy the corpus into the trainset layout the pipeline consumes,
    INVERTING polarity (phase-contrast cells are dark on gray; the
    synthetic corpus and the engine's bright-cell convention expect bright
    cells — a display convention, applied identically to every row)."""
    from microbeseg_tpu.utils.tiff import imread_page, imwrite

    trainset = out / "trainset_real"
    for split, idx in SPLITS.items():
        (trainset / split).mkdir(parents=True, exist_ok=True)
        for i in idx:
            img = imread_page(CORPUS / f"img_{i:02d}.tif", 0)
            mask = imread_page(CORPUS / f"mask_{i:02d}.tif", 0)
            imwrite(trainset / split / f"img_{i:02d}.tif",
                    (65535 - img).astype(np.uint16))
            imwrite(trainset / split / f"mask_{i:02d}.tif",
                    mask.astype(np.uint16))
    return trainset


def evaluate(models, trainset: Path, results: Path, tag: str):
    from microbeseg_tpu.config import EvalConfig
    from microbeseg_tpu.evaluation.evaluator import Evaluator

    # extended seed grid: rod/chain morphology merges under the reference's
    # 0.45-capped grid (docs/E2E_RESULTS.md rod analysis); the extension is
    # eval-only and costs no training
    cfg = EvalConfig(th_seeds=(0.35, 0.45, 0.55, 0.65, 0.75))
    ev = Evaluator(cfg, text_output=lambda m: print(f"[{tag}] {m}"))
    df = ev.evaluate(trainset, results / tag, [Path(m) for m in models])
    if df is None or not len(df):
        raise RuntimeError(f"evaluation produced no scores for {tag}")
    best = df.sort_values("aji+ (mean)", ascending=False).iloc[0]
    return {
        "model": str(best["model"]),
        "th_cell": float(best["th_cell"]),
        "th_seed": float(best["th_seed"]),
        "aji_mean": float(best["aji+ (mean)"]),
        "aji_std": float(best["aji+ (std)"]),
    }


def retrain(trainset: Path, out: Path, epochs: int) -> Path:
    from microbeseg_tpu.config import ModelConfig, TrainConfig
    from microbeseg_tpu.training.data import TrainingData
    from microbeseg_tpu.training.trainer import Trainer
    from microbeseg_tpu.training.workers import create_labels

    if not create_labels(trainset, "distance", text_output=print):
        raise RuntimeError("label generation failed")
    cfg = TrainConfig(
        model=ModelConfig(act_fun="mish", normalization="gn"),
        optimizer="ranger", batch_size=8, run_name="real_model_01",
        max_epochs=max(epochs, 20))
    models = out / "models" / "trainset_real"
    trainer = Trainer(cfg, models, text_output=print)
    trainer.fit(data=TrainingData.from_directory(trainset, "distance"))
    return models / cfg.run_name


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", nargs="+",
                   default=["_scale_flagship/models/trainset256/"
                            "distance_model_01"],
                   help="synthetic-trained checkpoint(s) for the zero-shot "
                        "row")
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--out", default="/tmp/real_eval")
    p.add_argument("--skip_retrain", action="store_true")
    args = p.parse_args(argv)

    out = Path(args.out)
    if out.exists():
        shutil.rmtree(out)
    trainset = stage_corpus(out)
    report = {"corpus": str(CORPUS), "test_frames": list(SPLITS["test"])}

    report["zero_shot"] = evaluate(args.model, trainset, out / "eval",
                                   "zero_shot")
    print(json.dumps({"zero_shot": report["zero_shot"]}))

    if not args.skip_retrain:
        stem = retrain(trainset, out, args.epochs)
        report["retrained"] = evaluate([stem], trainset, out / "eval",
                                       "retrained")
    print(json.dumps(report, indent=1))
    (out / "report.json").write_text(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
