"""Headless evaluation CLI — AJI+ threshold-grid model evaluation.

The reference exposes evaluation only through the GUI (EvalWorker wiring,
src/microbe_seg_gui.py:1039-1113); this CLI makes the same pipeline
scriptable: give it a trainset directory (with ``test/``) and one or more
checkpoints.
"""

from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path

from microbeseg_tpu.config import EvalConfig
from microbeseg_tpu.evaluation.evaluator import Evaluator


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="microbeSEG-tpu evaluation")
    parser.add_argument("--data", "-d", required=True, type=str,
                        help="Trainset directory containing test/")
    parser.add_argument("--models", "-m", required=True, type=str, nargs="+",
                        help="Checkpoint paths (.ckpt or stem)")
    parser.add_argument("--results", "-r", default=None, type=str,
                        help="Results directory")
    parser.add_argument("--save_raw", default=False, action="store_true",
                        help="Save raw CNN outputs")
    parser.add_argument("--th_cells", type=float, nargs="+", default=None,
                        help="Mask-threshold grid (default: the reference's "
                             "0.05 0.075 0.10 0.125, eval.py:128)")
    parser.add_argument("--th_seeds", type=float, nargs="+", default=None,
                        help="Seed-threshold grid (default: the reference's "
                             "0.35 0.45).  Touching high-aspect rod chains "
                             "separate at HIGHER seed thresholds than the "
                             "reference grid covers — 0.55-0.75 lifts rod "
                             "AJI+ by ~0.10 (docs/E2E_RESULTS.md); the best "
                             "grid point propagates into the inference "
                             "defaults via the aggregated eval csv")
    parser.add_argument("--refine", type=int, default=0, metavar="N",
                        help="coarse-to-fine threshold search: after the "
                             "grid, evaluate halved-spacing neighbors of "
                             "the best point for N rounds (beyond "
                             "reference; default 0 = grid only)")
    parser.add_argument("--tta", default=False, action="store_true",
                        help="Test-time augmentation: average predictions "
                             "over the dihedral transforms (beyond "
                             "reference; 4-8x forward cost)")
    parser.add_argument("--metrics", type=str, nargs="+", default=None,
                        choices=["aji", "dice", "pq"],
                        help="Extra per-image metric columns computed at "
                             "the AJI+-selected best thresholds (model "
                             "selection stays AJI+; the reference vendors "
                             "these but never surfaces them)")
    parser.add_argument("--ensemble", default=False, action="store_true",
                        help="Evaluate ALL --models as ONE ensemble "
                             "(averaged predictions, beyond reference) "
                             "instead of one row per model")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    path_data = Path(args.data)
    path_results = (Path(args.results) if args.results
                    else Path.cwd() / "evaluation" / path_data.name)
    path_results.mkdir(parents=True, exist_ok=True)
    cfg = EvalConfig(save_raw_pred=args.save_raw)
    if args.th_cells:
        cfg = dataclasses.replace(cfg, th_cells=tuple(args.th_cells))
    if args.th_seeds:
        cfg = dataclasses.replace(cfg, th_seeds=tuple(args.th_seeds))
    if args.refine:
        cfg = dataclasses.replace(cfg, refine_steps=args.refine)
    if args.tta:
        cfg = dataclasses.replace(cfg, tta=True)
    if args.ensemble:
        cfg = dataclasses.replace(cfg, ensemble=True)
    if args.metrics:
        cfg = dataclasses.replace(cfg, extra_metrics=tuple(args.metrics))
    ev = Evaluator(cfg, text_output=print)
    df = ev.evaluate(path_data, path_results,
                     [Path(m) for m in args.models])
    if df is None:
        return 1
    print(df.to_string(index=False))
    return 0
