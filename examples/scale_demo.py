"""BASELINE config 5 at scale: the full product loop over an OMERO-sized
corpus of 2D+t experiments, with per-stage wall-clock reporting.

Builds a LocalStore holding dozens of 2D+t experiments (1024^2-2048^2
frames, synthetic microscopy-like cells with ground-truth masks standing in
for ObiWan-corrected annotations), then drives the COMPLETE workflow the
reference implements across its GUI + workers (SURVEY §3):

  import    -> external img/mask crops into the trainset (data_import.py)
  crop      -> interactive-crop semantics headlessly: segmented window
               placement, split_info persistence, GT-mask 'annotations'
  export    -> trainset download: ROI rasterize + renormalize (data_export.py)
  labels    -> distance label generation on device (train.py:26-104)
  train     -> Ranger two-phase schedule (train.py:115-576)
  prelabel  -> a second crop session WITH model pre-labeling (data_cropping.py)
  eval      -> AJI+ threshold grid over the test split (eval.py)
  infer     -> every experiment, 2D+t, tiled sliding window (infer.py)
  analysis  -> per-frame counts/areas/axes CSV (analysis.py)
  results   -> mask/overlay/outlines export (result_export.py)

Run: python examples/scale_demo.py [--experiments 12] [--frames 6]
     [--epochs 40] [--out DIR]
Writes {out}/scale_summary.json and prints a per-stage wall-clock table.
"""

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from microbeseg_tpu.config import (EvalConfig, InferConfig, ModelConfig,
                                   TrainConfig)
from microbeseg_tpu.client.store import LocalStore
from microbeseg_tpu.client.workers import (CropGenerator, _mask_to_rois,
                                           analyze_dataset, export_results,
                                           export_trainset, import_data,
                                           infer_dataset, split_assignment,
                                           timestamp)
from microbeseg_tpu.evaluation.evaluator import Evaluator
from microbeseg_tpu.inference.engine import InferenceEngine
from microbeseg_tpu.training.data import TrainingData
from microbeseg_tpu.training.trainer import Trainer
from microbeseg_tpu.training.workers import create_labels
from microbeseg_tpu.utils.tiff import imwrite


def synth_frame(rng, size, density=1.0, shape="ellipse"):
    """Synthetic microscopy frame + ground-truth instance mask.

    Each blob only touches its local window (the naive full-frame version is
    O(n_blobs * size^2) — minutes per 2048^2 frame on this 1-core host).
    ``shape``: 'ellipse' (round cocci), 'rods' (rotated capsules with
    touching end-to-end chains, the hard morphology — see e2e_demo), or
    'mixed' (per-group random)."""
    mask = np.zeros((size, size), np.uint16)
    img = rng.normal(6000, 300, (size, size))
    n_blobs = int(density * 10 * (size / 128) ** 2)
    label = 0

    def place(cy, cx, ey, ex, field):
        """Window-local placement: evaluate the normalized distance field
        ``field(yy, xx)`` only inside the (2 ey + 1) x (2 ex + 1) window."""
        nonlocal label
        y0, y1 = cy - ey, cy + ey + 1
        x0, x1 = cx - ex, cx + ex + 1
        if y0 < 0 or x0 < 0 or y1 > size or x1 > size:
            return False
        yy, xx = np.mgrid[y0:y1, x0:x1]
        d = field(yy, xx)
        blob = d <= 1
        sub_mask = mask[y0:y1, x0:x1]
        if not blob.any() or (sub_mask[blob] > 0).mean() > 0.2:
            return False
        label += 1
        sub_mask[blob & (sub_mask == 0)] = label
        img[y0:y1, x0:x1] += np.where(blob,
                                      25000 * np.clip(1.2 - d, 0, 1.2), 0)
        return True

    for _ in range(n_blobs):
        kind = shape
        if shape == "mixed":
            kind = "rods" if rng.random() < 0.5 else "ellipse"
        if kind == "rods":
            r = int(rng.integers(3, 6))
            half = int(rng.integers(6, 16))
            theta = rng.uniform(0, np.pi)
            ext = half + r + 1
            if size <= 2 * ext:
                continue
            cy = int(rng.integers(ext, size - ext))
            cx = int(rng.integers(ext, size - ext))
            links = 1 + (rng.random() < 0.5) + (rng.random() < 0.25)
            for _ in range(links):  # touching end-to-end chain
                uy, ux = np.cos(theta), np.sin(theta)

                def capsule(yy, xx, cy=cy, cx=cx, uy=uy, ux=ux):
                    t = np.clip((yy - cy) * uy + (xx - cx) * ux, -half, half)
                    return np.hypot(yy - cy - t * uy, xx - cx - t * ux) / r

                place(cy, cx, ext, ext, capsule)
                theta2 = theta + rng.uniform(-0.35, 0.35)
                step = half + r  # tip of this rod = tip of the next
                cy += int(round(step * np.cos(theta) + step * np.cos(theta2)))
                cx += int(round(step * np.sin(theta) + step * np.sin(theta2)))
                theta = theta2
                if not (ext <= cy < size - ext and ext <= cx < size - ext):
                    break
        else:
            ry, rx = rng.integers(6, 14, 2)
            cy = rng.integers(ry + 2, size - ry - 2)
            cx = rng.integers(rx + 2, size - rx - 2)

            def ellipse(yy, xx, cy=cy, cx=cx, ry=ry, rx=rx):
                return np.sqrt(((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2)

            place(int(cy), int(cx), int(ry), int(rx), ellipse)
    img = img + rng.normal(0, 400, img.shape)
    img = (img - img.min()) / (img.max() - img.min()) * 65535
    return img.astype(np.uint16), mask


class StageClock:
    def __init__(self):
        self.rows = []

    def stage(self, name, fn, unit=None, count=None):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        rate = f", {count / dt:.2f} {unit}/s" if unit else ""
        self.rows.append({"stage": name, "seconds": round(dt, 2),
                          **({"count": count, "unit": unit} if unit else {})})
        print(f"[{name}] {dt:.1f}s{rate}", flush=True)
        return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--experiments", type=int, default=12)
    p.add_argument("--frames", type=int, default=6, help="frames per 2D+t stack")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--crops", type=int, default=60,
                   help="annotated crops accepted into the trainset")
    p.add_argument("--filters", default="16,128",
                   help="encoder filter range f0,f1 (flagship: 64,1024 — "
                        "the reference default, unets.py:320-331)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--shape", default="ellipse",
                   choices=("ellipse", "rods", "mixed"),
                   help="corpus morphology (rods = touching chains, the "
                        "hard case; see e2e_demo/E2E_RESULTS)")
    p.add_argument("--th_seeds", type=float, nargs="+", default=None,
                   help="evaluation seed-threshold grid override "
                        "(recommend 0.35 0.45 0.55 0.65 0.75 for rods)")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    filters = tuple(int(f) for f in args.filters.split(","))

    out = (Path(args.out) if args.out
           else Path(__file__).resolve().parents[1] / "_scale_out")
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True)
    rng = np.random.default_rng(11)
    clock = StageClock()
    store = LocalStore(out / "store")
    gt = {}  # (image_id, frame) -> ground-truth mask

    # ---- corpus: dozens of 2D+t experiments at 1024^2-2048^2 ------------
    def build_corpus():
        pid = store.create_project("scale-demo")
        exp_ids = []
        sizes = []
        for e in range(args.experiments):
            size = [1024, 1024, 1280, 2048][e % 4]
            did = store.create_dataset(f"experiment_{e:02d}", project_id=pid)
            frames, masks = zip(*[synth_frame(rng, size, shape=args.shape)
                                  for _ in range(args.frames)])
            iid = store.upload_image(did, f"exp{e:02d}.tif",
                                     np.stack(frames))
            for t, m in enumerate(masks):
                gt[(iid, t)] = m
            exp_ids.append(did)
            sizes.append(size)
        return pid, exp_ids, sizes

    n_px = None
    pid, exp_ids, sizes = clock.stage(
        "corpus", build_corpus, unit="frame",
        count=args.experiments * args.frames)
    n_px = sum(s * s for s in sizes) * args.frames

    trainset_id = store.create_dataset("trainset256", project_id=pid)
    store.set_dataset_map_annotation(trainset_id, {"crop_size": "256"})

    # ---- import: a few external img/mask pairs (data_import.py) ---------
    def do_import():
        src = out / "import_src"
        src.mkdir()
        imgs, masks = [], []
        for i in range(4):
            im, m = synth_frame(rng, 512, shape=args.shape)
            imwrite(src / f"img{i}.tif", im)
            imwrite(src / f"mask{i}.tif", m)
            imgs.append(src / f"img{i}.tif")
            masks.append(src / f"mask{i}.tif")
        return import_data(store, trainset_id, imgs, masks, crop_size=256)

    imported = clock.stage("import", do_import, unit="crop", count=16)

    # ---- crop creation with GT 'annotations' (data_cropping.py + GUI) ---
    def do_crops(engine=None, n_accept=args.crops, label=""):
        gen = CropGenerator(store, crop_size=256, engine=engine,
                            trainset_id=trainset_id, seed=3)
        items = []
        for did in exp_ids:
            items.extend((did, iid_frame) for iid_frame
                         in gen.crop_list(did))
        accepted = 0
        for _, (iid, frame) in items:
            if accepted >= n_accept:
                break
            # accept EVERY crop of the set (the reference's three
            # accept-checkboxes allow the same, gui:2687-2725)
            for crop in gen.next_crops(iid, frame):
                if accepted >= n_accept:
                    break
                subset = split_assignment(gen.split_info["num_acc"])
                cid = gen.upload_crop(crop, trainset_id, subset)
                # the ObiWan annotation step, simulated: ground-truth ROIs +
                # last_modification (export skips uncorrected pre-labels)
                m = gt[(iid, frame)][crop.y:crop.y + 256,
                                     crop.x:crop.x + 256]
                store.delete_polygons(cid)
                store.add_polygons(cid, _mask_to_rois(m))
                store.set_map_annotation(cid,
                                         {"last_modification": timestamp()})
                accepted += 1
        return accepted

    n_acc = clock.stage("crop", do_crops, unit="crop", count=args.crops)
    assert n_acc >= min(args.crops, 10), f"only {n_acc} crops accepted"

    # ---- export + labels + train (train_script pipeline) ----------------
    train_dir = out / "training_dataset"
    clock.stage("export", lambda: export_trainset(store, trainset_id,
                                                  train_dir),
                unit="crop", count=n_acc + len(imported))
    data_dir = train_dir / "trainset256"
    clock.stage("labels", lambda: create_labels(data_dir, "distance"))

    run_name = "distance_model_01"
    cfg = TrainConfig(model=ModelConfig(unet_type="DU", ch_out=1,
                                        filters=filters, act_fun="mish",
                                        normalization="gn"),
                      label_type="distance", optimizer="ranger",
                      batch_size=args.batch_size, run_name=run_name,
                      max_epochs=args.epochs)
    data = TrainingData.from_directory(data_dir, label_type="distance")
    models_dir = out / "models" / "trainset256"
    trainer = Trainer(cfg, models_dir)
    best = clock.stage(
        "train", lambda: trainer.fit(data),
        unit="epoch-crop", count=args.epochs * len(data.train))

    # bucket-pad path for frames within the tested-shape table (measured
    # 4-8x the forced-tiling throughput at 1024^2-2048^2, perf_matrix);
    # sliding-window tiling engages automatically beyond the table
    engine = InferenceEngine.from_checkpoint(
        models_dir / run_name,
        cfg=InferConfig(tile_size=512, tile_overlap=64))

    # ---- a second crop session WITH pre-labeling ------------------------
    clock.stage("prelabel",
                lambda: do_crops(engine=engine, n_accept=8, label="pre"),
                unit="crop", count=8)

    # ---- evaluation: AJI+ threshold grid over the test split ------------
    ecfg = (EvalConfig(th_seeds=tuple(args.th_seeds))
            if args.th_seeds else EvalConfig())
    ev = Evaluator(ecfg)
    df = clock.stage("eval", lambda: ev.evaluate(
        data_dir, out / "evaluation" / "trainset256",
        [models_dir / run_name]))

    # ---- inference over EVERY experiment (2D+t, tiled) ------------------
    def do_infer():
        for did in exp_ids:
            ids = [r.image_id for r in store.list_images(did)]
            infer_dataset(store, ids, engine, model_name=run_name,
                          result_dir=out / "results")
    clock.stage("infer", do_infer, unit="Mpx",
                count=round(n_px / 1e6))

    # ---- analysis + result export ---------------------------------------
    all_ids = [r.image_id for did in exp_ids
               for r in store.list_images(did)]
    clock.stage("analysis", lambda: analyze_dataset(
        store, all_ids, out / "results"), unit="image", count=len(all_ids))
    clock.stage("results", lambda: export_results(
        store, all_ids[:4], out / "results"), unit="image", count=4)

    # ---- quality check vs ground truth on one inferred stack ------------
    from microbeseg_tpu.evaluation.metrics import get_fast_aji_plus
    ref0 = store.list_images(exp_ids[0])[0]
    polys = store.get_polygons(ref0.image_id)
    from microbeseg_tpu.client.workers import _rasterize_rois
    pred0 = _rasterize_rois(polys, 0, (ref0.size_y, ref0.size_x))
    aji_full = get_fast_aji_plus(gt[(ref0.image_id, 0)], pred0)

    summary = {
        "experiments": args.experiments, "frames": args.frames,
        "shape": args.shape, "filters": list(filters),
        "batch_size": args.batch_size, "epochs": args.epochs,
        "th_seeds": args.th_seeds,
        "sizes": sizes, "total_megapixels": round(n_px / 1e6, 1),
        "crops_annotated": n_acc, "best_val_loss": float(best),
        "aji_mean_testset": float(df.iloc[0]["aji+ (mean)"]),
        "aji_fullframe_2048_or_1024": float(aji_full),
        "stages": clock.rows,
    }
    (out / "scale_summary.json").write_text(json.dumps(summary, indent=2))
    print("SUMMARY", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
