"""Self-training on the unlabeled real frames (VERDICT r4 item 1).

Round 4 measured an annotation-free plateau: domain-randomized (DR)
synthetic training reaches AJI+ 0.453 zero-shot on the real C. glutamicum
test frames, flat under more data / ensembles / TTA, and declared the gap
"appearance-limited".  This experiment tests that claim with the obvious
next lever the product itself provides: the pre-label loop
(reference: src/utils/data_cropping.py:208-242) with the human removed —

  round r:
    1. pseudo-label the real train/val frames (0-39, raw polarity) with
       the current teacher (r=1: the two DR checkpoints as an ensemble,
       engine TTA on),
    2. filter instances by CROSS-DIHEDRAL CONSISTENCY: the same teacher
       re-segments dihedrally transformed copies of each frame (rot90 /
       rot180 / fliplr, masks mapped back), and a pseudo-instance is kept
       only if every variant contains a matching instance with
       IoU >= tau (default 0.5) — prediction-stability as the
       label-confidence signal (plus a min-area floor),
    3. regenerate distance labels from the filtered pseudo-masks on
       device (ops/labelgen) and train a student from scratch
       (flagship config, same as scripts/real_data_eval.py),
    4. evaluate the student on the held-out real test frames (40-49,
       extended seed grid — same protocol as every prior real row),
    5. the student becomes the next round's teacher.

Annotation-free threshold selection: round-1 pseudo-labeling thresholds
are picked by evaluating the DR ensemble on its own SYNTHETIC validation
split (no real labels involved); later rounds select on the PSEUDO-val
frames (teacher labels, not GT).  Real GT enters only (a) the held-out
test rows and (b) pseudo-label-quality DIAGNOSTICS on the train frames,
both reported, neither fed back into training.

Run ON THE CHIP (~20 min/round):
  python scripts/self_training.py --rounds 3 [--tau 0.5] [--finetune]
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
TEACHERS = [ROOT / "_scale_selftrain" / "teachers" / "dr_a",
            ROOT / "_scale_selftrain" / "teachers" / "dr_b"]
SYNTH_VAL = ROOT / "_scale_selftrain" / "synth_val"
TRAIN_FRAMES = range(0, 35)
VAL_FRAMES = range(35, 40)
TEST_FRAMES = range(40, 50)

# dihedral variants for the consistency filter: (forward on (T,H,W) frames,
# inverse on (T,H,W) masks)
DIHEDRALS = [
    ("rot90", lambda a: np.rot90(a, 1, (1, 2)),
     lambda a: np.rot90(a, -1, (1, 2))),
    ("rot180", lambda a: np.rot90(a, 2, (1, 2)),
     lambda a: np.rot90(a, -2, (1, 2))),
    ("fliplr", lambda a: a[:, :, ::-1], lambda a: a[:, :, ::-1]),
]


def load_frames(idx) -> np.ndarray:
    from microbeseg_tpu.utils.tiff import imread_page
    return np.stack([imread_page(CORPUS / f"img_{i:02d}.tif", 0)
                     for i in idx])


def load_gt(idx) -> np.ndarray:
    from microbeseg_tpu.utils.tiff import imread_page
    return np.stack([imread_page(CORPUS / f"mask_{i:02d}.tif", 0)
                     for i in idx])


def instance_max_iou(base: np.ndarray, member: np.ndarray) -> np.ndarray:
    """max IoU of each base instance (ids 1..nb, dense) vs ANY member
    instance — sparse-contingency, no per-instance scans."""
    nb = int(base.max())
    if nb == 0:
        return np.zeros(0)
    t = base.ravel().astype(np.int64)
    p = member.ravel().astype(np.int64)
    npred = int(member.max())
    ta = np.bincount(t, minlength=nb + 1)[1:].astype(np.float64)
    pa = np.bincount(p, minlength=npred + 1).astype(np.float64)
    if npred == 0:
        return np.zeros(nb)
    both = (t > 0) & (p > 0)
    pair = t[both] * (npred + 1) + p[both]
    cnt = np.bincount(pair, minlength=(nb + 1) * (npred + 1))
    inter = cnt.reshape(nb + 1, npred + 1)[1:, 1:].astype(np.float64)
    union = ta[:, None] + pa[1:][None, :] - inter
    iou = np.where(inter > 0, inter / union, 0.0)
    return iou.max(axis=1)


def consistency_filter(base: np.ndarray, members, tau: float,
                       min_area: int):
    """Keep base instances whose min-over-members max-IoU >= tau and whose
    area >= min_area.  Returns (filtered mask, n_kept, n_dropped)."""
    from microbeseg_tpu.evaluation.metrics import remap_label
    base = remap_label(base)
    nb = int(base.max())
    if nb == 0:
        return base.astype(np.uint16), 0, 0
    agree = np.ones(nb)
    for m in members:
        agree = np.minimum(agree, instance_max_iou(base, m))
    areas = np.bincount(base.ravel().astype(np.int64),
                        minlength=nb + 1)[1:]
    keep = (agree >= tau) & (areas >= min_area)
    table = np.zeros(nb + 1, np.uint16)
    table[1:][keep] = np.arange(1, int(keep.sum()) + 1, dtype=np.uint16)
    return table[base], int(keep.sum()), int((~keep).sum())


def pseudo_label(teachers, frames: np.ndarray, th_cell: float,
                 th_seed: float, tau: float, min_area: int, log):
    """Ensemble+TTA base masks, filtered by cross-dihedral consistency."""
    from microbeseg_tpu.config import InferConfig
    from microbeseg_tpu.inference.engine import InferenceEngine

    eng_tta = InferenceEngine.from_checkpoints(
        teachers, InferConfig(tta=True))
    base = eng_tta.segment(frames, th_cell=th_cell, th_seed=th_seed)
    del eng_tta
    eng = InferenceEngine.from_checkpoints(teachers, InferConfig())
    members = [eng.segment(frames, th_cell=th_cell, th_seed=th_seed)]
    for name, fwd, inv in DIHEDRALS:
        m = eng.segment(np.ascontiguousarray(fwd(frames)),
                        th_cell=th_cell, th_seed=th_seed)
        members.append(np.ascontiguousarray(inv(m)))
    del eng

    masks = np.zeros_like(base)
    kept = dropped = 0
    for i in range(len(frames)):
        masks[i], k, d = consistency_filter(
            base[i], [m[i] for m in members], tau, min_area)
        kept += k
        dropped += d
    log(f"pseudo-labels: kept {kept}, dropped {dropped} "
        f"({kept / max(kept + dropped, 1):.1%} pass the filter)")
    return masks, base, kept, dropped


def pseudo_quality(pseudo: np.ndarray, idx) -> float:
    """DIAGNOSTIC ONLY: mean AJI+ of pseudo-masks vs GT over frames."""
    from microbeseg_tpu.evaluation.metrics import get_fast_aji_plus
    gt = load_gt(idx)
    return float(np.mean([get_fast_aji_plus(gt[i], pseudo[i])
                          for i in range(len(gt))]))


def write_split(trainset: Path, split: str, idx, frames, masks):
    from microbeseg_tpu.utils.tiff import imwrite
    d = trainset / split
    if d.exists():
        shutil.rmtree(d)
    d.mkdir(parents=True)
    for j, i in enumerate(idx):
        imwrite(d / f"img_{i:02d}.tif", frames[j].astype(np.uint16))
        imwrite(d / f"mask_{i:02d}.tif", masks[j].astype(np.uint16))


def eval_models(models, trainset: Path, results: Path, tag: str,
                th_seeds=(0.35, 0.45, 0.55, 0.65, 0.75), tta=False,
                ensemble=False):
    from microbeseg_tpu.config import EvalConfig
    from microbeseg_tpu.evaluation.evaluator import Evaluator

    cfg = EvalConfig(th_seeds=th_seeds, tta=tta, ensemble=ensemble)
    ev = Evaluator(cfg, text_output=lambda m: None)
    df = ev.evaluate(trainset, results / tag, [Path(m) for m in models])
    if df is None or not len(df):
        raise RuntimeError(f"evaluation produced no scores for {tag}")
    best = df.sort_values("aji+ (mean)", ascending=False).iloc[0]
    return {"th_cell": float(best["th_cell"]),
            "th_seed": float(best["th_seed"]),
            "aji_mean": float(best["aji+ (mean)"]),
            "aji_std": float(best["aji+ (std)"])}


def select_round1_thresholds(out: Path, log):
    """Annotation-free: DR-ensemble threshold grid on the SYNTHETIC val
    split the DR run trained against (no real labels touched)."""
    trainset = out / "thsel_synth"
    test = trainset / "test"
    test.mkdir(parents=True, exist_ok=True)
    for f in SYNTH_VAL.glob("*.tif"):
        shutil.copy(f, test / f.name)
    row = eval_models(TEACHERS, trainset, out / "eval", "thsel_synth",
                      tta=True, ensemble=True)
    log(f"round-1 thresholds from synthetic val: "
        f"th_cell={row['th_cell']}, th_seed={row['th_seed']} "
        f"(synth AJI+ {row['aji_mean']:.3f})")
    return row["th_cell"], row["th_seed"]


def train_student(trainset: Path, out: Path, run_name: str, epochs: int,
                  init_from, log) -> Path:
    from microbeseg_tpu.config import ModelConfig, TrainConfig
    from microbeseg_tpu.training.data import TrainingData
    from microbeseg_tpu.training.trainer import Trainer
    from microbeseg_tpu.training.workers import create_labels

    if not create_labels(trainset, "distance", text_output=log):
        raise RuntimeError("label generation failed")
    cfg = TrainConfig(
        model=ModelConfig(act_fun="mish", normalization="gn"),
        optimizer="ranger", batch_size=8, run_name=run_name,
        max_epochs=max(epochs, 20))
    models = out / "models" / trainset.name
    trainer = Trainer(cfg, models, text_output=log)
    trainer.fit(TrainingData.from_directory(trainset, "distance"),
                init_from=init_from)
    return models / run_name


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--tau", type=float, default=0.5,
                   help="min cross-dihedral IoU to keep a pseudo-instance")
    p.add_argument("--min_area", type=int, default=20)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--th_cell", type=float, default=None,
                   help="override round-1 pseudo-label th_cell")
    p.add_argument("--th_seed", type=float, default=None)
    p.add_argument("--no_filter", action="store_true",
                   help="ablation: train on unfiltered base pseudo-masks")
    p.add_argument("--finetune", action="store_true",
                   help="warm-start each student from the previous teacher "
                        "checkpoint instead of scratch")
    p.add_argument("--teachers", nargs="+", default=None,
                   help="override the round-1 teacher checkpoint stem(s) "
                        "(e.g. a prior run's student, to continue the loop "
                        "without replaying earlier rounds; pair with "
                        "--th_cell/--th_seed from that run's thsel_next)")
    p.add_argument("--start_round", type=int, default=1,
                   help="numbering offset for continued runs (labels only)")
    p.add_argument("--out", default="/tmp/selftrain")
    args = p.parse_args(argv)

    out = Path(args.out)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)

    def log(msg):
        print(f"[selftrain] {msg}", flush=True)

    frames = load_frames(list(TRAIN_FRAMES) + list(VAL_FRAMES))
    n_train = len(list(TRAIN_FRAMES))

    # held-out real test trainset (GT masks; rows comparable to the
    # 0.453 DR and 0.839 trained-on-real rows — raw polarity)
    test_set = out / "testset_real"
    write_split(test_set, "test", TEST_FRAMES, load_frames(TEST_FRAMES),
                load_gt(TEST_FRAMES))

    report = {"config": vars(args), "rounds": []}
    if args.th_cell is not None and args.th_seed is not None:
        th_cell, th_seed = args.th_cell, args.th_seed
    else:
        th_cell, th_seed = select_round1_thresholds(out, log)
    report["round1_thresholds"] = [th_cell, th_seed]

    teachers = [str(t) for t in (args.teachers or TEACHERS)]
    for r in range(args.start_round, args.start_round + args.rounds):
        log(f"=== round {r}: teacher={teachers}, "
            f"th=({th_cell}, {th_seed}) ===")
        pseudo, base, kept, dropped = pseudo_label(
            teachers, frames, th_cell, th_seed, args.tau, args.min_area,
            log)
        row = {"round": r, "th_cell": th_cell, "th_seed": th_seed,
               "kept": kept, "dropped": dropped}
        train_masks = base if args.no_filter else pseudo
        row["pseudo_aji_unfiltered"] = pseudo_quality(
            base[:n_train], TRAIN_FRAMES)
        row["pseudo_aji_filtered"] = pseudo_quality(
            pseudo[:n_train], TRAIN_FRAMES)
        log(f"pseudo quality (diagnostic): unfiltered "
            f"{row['pseudo_aji_unfiltered']:.3f}, filtered "
            f"{row['pseudo_aji_filtered']:.3f}")

        trainset = out / f"trainset_r{r}"
        write_split(trainset, "train", TRAIN_FRAMES,
                    frames[:n_train], train_masks[:n_train])
        write_split(trainset, "val", VAL_FRAMES,
                    frames[n_train:], train_masks[n_train:])

        init = Path(teachers[0]) if args.finetune else None
        student = train_student(trainset, out, f"selftrain_r{r:02d}",
                                args.epochs, init, log)

        row["test"] = eval_models([student], test_set, out / "eval",
                                  f"test_r{r}")
        log(f"round {r} REAL TEST AJI+ = {row['test']['aji_mean']:.3f} "
            f"± {row['test']['aji_std']:.3f} "
            f"(th {row['test']['th_cell']}, {row['test']['th_seed']})")

        # annotation-free threshold selection for the NEXT round: grid on
        # the pseudo-val frames (teacher labels, not GT)
        thsel = out / f"thsel_r{r}"
        write_split(thsel, "test", VAL_FRAMES, frames[n_train:],
                    train_masks[n_train:])
        sel = eval_models([student], thsel, out / "eval", f"thsel_r{r}")
        row["thsel_next"] = sel
        th_cell, th_seed = sel["th_cell"], sel["th_seed"]

        teachers = [str(student)]
        report["rounds"].append(row)
        (out / "report.json").write_text(json.dumps(report, indent=1))

    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
