"""Few-shot label-efficiency curve on real data (VERDICT r4 item 2).

The product's core loop is: pre-label -> hand-correct a few crops ->
train (reference: src/utils/data_cropping.py:208-242 + train.py).  The
question a reference user actually cares about: HOW MANY corrected
frames are needed, and does domain-randomized (DR) synthetic pre-training
buy label efficiency?

Protocol: n corrected train frames (the first n of the real time-lapse,
frames 0..n-1, n in {1, 3, 5, 10, 20, 35}) x {from scratch, fine-tune
from the DR checkpoint}; fixed val = frames 35-39 (GT), fixed held-out
test = frames 40-49 (GT), extended seed grid — the same eval protocol as
every prior real row (scripts/real_data_eval.py).

Controls for comparability:
  - RAW polarity everywhere (the DR teacher was trained on raw phase
    contrast; fine-tuning needs matching polarity, so the scratch arm
    uses it too),
  - every train set is replicated to >= 32 crops so all runs take the
    same steps/epoch (the random augmentation decorrelates replicas);
    differences across n then measure data DIVERSITY, not step count,
  - fixed 60-epoch budget (the budget of every prior row; the product's
    epoch heuristic would train tiny sets ~10x longer, config.py:166-181),
  - fixed val frames isolate the train-size effect ("n corrected frames"
    therefore means n + 5 in user terms).

Run ON THE CHIP (~1 h for 12 runs):
  python scripts/few_shot_curve.py [--sizes 1 3 5 10 20 35] [--epochs 60]
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
DR_TEACHER = ROOT / "_scale_selftrain" / "teachers" / "dr_a"
VAL_FRAMES = range(35, 40)
TEST_FRAMES = range(40, 50)
MIN_CROPS = 32


def _load(idx, kind):
    from microbeseg_tpu.utils.tiff import imread_page
    return [imread_page(CORPUS / f"{kind}_{i:02d}.tif", 0) for i in idx]


def write_split(d: Path, names, imgs, masks):
    from microbeseg_tpu.utils.tiff import imwrite
    if d.exists():
        shutil.rmtree(d)
    d.mkdir(parents=True)
    for name, img, mask in zip(names, imgs, masks):
        imwrite(d / f"img_{name}.tif", np.asarray(img, np.uint16))
        imwrite(d / f"mask_{name}.tif", np.asarray(mask, np.uint16))


def stage_trainset(out: Path, n: int) -> Path:
    """First n real frames as train (replicated to >= MIN_CROPS crops),
    fixed GT val."""
    trainset = out / f"trainset_n{n:02d}"
    idx = list(range(n))
    imgs, masks = _load(idx, "img"), _load(idx, "mask")
    reps = max(1, -(-MIN_CROPS // n))
    names, rimgs, rmasks = [], [], []
    for rep in range(reps):
        for i in idx:
            names.append(f"{i:02d}_rep{rep}")
            rimgs.append(imgs[i])
            rmasks.append(masks[i])
    write_split(trainset / "train", names, rimgs, rmasks)
    write_split(trainset / "val", [f"{i:02d}" for i in VAL_FRAMES],
                _load(VAL_FRAMES, "img"), _load(VAL_FRAMES, "mask"))
    return trainset


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+",
                   default=[1, 3, 5, 10, 20, 35])
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--arms", nargs="+", default=["scratch", "finetune"])
    p.add_argument("--seed", type=int, default=0,
                   help="training seed (repeat a point to bound run noise)")
    p.add_argument("--out", default="/tmp/fewshot")
    args = p.parse_args(argv)

    from microbeseg_tpu.config import EvalConfig, ModelConfig, TrainConfig
    from microbeseg_tpu.evaluation.evaluator import Evaluator
    from microbeseg_tpu.training.data import TrainingData
    from microbeseg_tpu.training.trainer import Trainer
    from microbeseg_tpu.training.workers import create_labels

    out = Path(args.out)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)

    test_set = out / "testset_real"
    write_split(test_set / "test", [f"{i:02d}" for i in TEST_FRAMES],
                _load(TEST_FRAMES, "img"), _load(TEST_FRAMES, "mask"))

    report = {"config": vars(args), "points": []}
    for n in args.sizes:
        trainset = stage_trainset(out, n)
        if not create_labels(trainset, "distance", text_output=print):
            raise RuntimeError("label generation failed")
        data = TrainingData.from_directory(trainset, "distance")
        for arm in args.arms:
            run = f"n{n:02d}_{arm}"
            print(f"[fewshot] === {run} ===", flush=True)
            cfg = TrainConfig(
                model=ModelConfig(act_fun="mish", normalization="gn"),
                optimizer="ranger", batch_size=8, run_name=run,
                max_epochs=max(args.epochs, 20), seed=args.seed)
            models = out / "models" / trainset.name
            Trainer(cfg, models, text_output=lambda m: None).fit(
                data,
                init_from=DR_TEACHER if arm == "finetune" else None)
            ev = Evaluator(EvalConfig(th_seeds=(0.35, 0.45, 0.55, 0.65,
                                                0.75)),
                           text_output=lambda m: None)
            # one results dir PER RUN: Evaluator aggregates all rows of a
            # results dir into one csv and a shared dir would let a prior
            # run's better row win the .iloc[0] selection below
            df = ev.evaluate(test_set, out / "eval" / run, [models / run])
            df = df[df["model"].str.endswith(f": {run}")]
            best = df.sort_values("aji+ (mean)", ascending=False).iloc[0]
            row = {"n": n, "arm": arm,
                   "aji_mean": float(best["aji+ (mean)"]),
                   "aji_std": float(best["aji+ (std)"]),
                   "th_cell": float(best["th_cell"]),
                   "th_seed": float(best["th_seed"])}
            print(f"[fewshot] {run}: AJI+ {row['aji_mean']:.3f} "
                  f"± {row['aji_std']:.3f}", flush=True)
            report["points"].append(row)
            (out / "report.json").write_text(json.dumps(report, indent=1))

    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
