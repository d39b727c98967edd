"""Headless workers: label creation and multi-iteration training.

Re-hosts the reference's CreateLabelsWorker / TrainWorker orchestration
(src/training/train.py:26-104, :115-306) without Qt: callbacks replace
signals, and the OOM retry ladder (batch 16 -> 8 -> 4, then filters
(64,1024) -> (32,512) -> (32,256); reference :276-297) catches JAX
RESOURCE_EXHAUSTED errors instead of torch RuntimeError.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Callable, Optional

import numpy as np

from microbeseg_tpu.config import ModelConfig, TrainConfig
from microbeseg_tpu.ops.labelgen import get_label, max_major_axis_length
from microbeseg_tpu.training.data import TrainingData
from microbeseg_tpu.training.trainer import Trainer
from microbeseg_tpu.utils.image import unique_path
from microbeseg_tpu.utils.tiff import imread, imwrite


def _noop(*a, **k):
    pass


def create_labels(path: Path, label_type: str,
                  text_output: Callable[[str], None] = _noop,
                  progress: Callable[[int], None] = _noop,
                  should_stop: Callable[[], bool] = lambda: False) -> bool:
    """Generate label TIFFs next to mask TIFFs in {path}/{train,val}
    (reference CreateLabelsWorker.create_labels, train.py:33-104)."""
    path = Path(path)
    mask_ids_train = sorted((path / "train").glob("mask*.tif"))
    mask_ids_val = sorted((path / "val").glob("mask*.tif"))
    if len(mask_ids_val) < 2 or len(mask_ids_train) < 2:
        text_output("The training and the validation set should each contain "
                    "at least two annotated images! Stop")
        return False
    text_output("Create labels")
    mask_ids = mask_ids_train + mask_ids_val
    for i, mask_id in enumerate(mask_ids):
        if should_stop():
            text_output("Stop label creation due to user interaction.")
            return False
        mask = imread(mask_id)
        # every radius-windowed label type needs the measured major axis
        # (the reference computes it unconditionally, train.py:74-84);
        # max_mal=0 would shrink the EDT window to nothing and emit
        # all-zero labels
        max_mal = (max_major_axis_length(mask)
                   if label_type in ("distance", "cell_dist",
                                     "cell_dist_clipped") else 0)
        label = get_label(mask=mask, label_type=label_type, max_mal=max_mal)
        fname = mask_id.name.split("mask_")[-1]
        if label_type == "distance":
            imwrite(mask_id.parent / f"cell_dist_{fname}", label[0])
            imwrite(mask_id.parent / f"neighbor_dist_{fname}", label[1])
        else:
            imwrite(mask_id.parent / f"{label_type}_{fname}", label)
        progress(int(100 * (i + 1) / len(mask_ids)))
    return True


_OOM_MARKERS = ("RESOURCE_EXHAUSTED", "Out of memory", "out of memory", "OOM")


def _is_oom(exc: Exception) -> bool:
    return any(m in str(exc) for m in _OOM_MARKERS)


def run_training(path_data: Path, path_models: Path, label_type: str,
                 iterations: int, optimizer: str, batch_size: int,
                 text_output: Callable[[str], None] = _noop,
                 progress: Callable[[int], None] = _noop,
                 should_stop: Callable[[], bool] = lambda: False,
                 num_devices: Optional[int] = None,
                 print_output: bool = False,
                 seed: int = 0,
                 normalization: str = "gn",
                 max_epochs: Optional[int] = None,
                 train_state_every: int = 0,
                 resume: bool = False,
                 pretrained: Optional[Path] = None) -> bool:
    """Train `iterations` models (reference TrainWorker.start_training,
    train.py:124-306): per-iteration unique run names, act-fun tied to the
    optimizer (mish <-> ranger, relu <-> adam; reference :174), OOM ladder.

    pretrained: checkpoint stem to warm-start each iteration's first run
    from (fine-tuning; beyond reference — it always trains from scratch).

    normalization: default 'gn' — a documented deviation from the reference's
    hard-coded 'bn' (train.py:187).  BatchNorm running statistics diverge
    badly from batch statistics under small batches + heavy randomized
    augmentation (eval-mode predictions collapse; measured on-TPU: AJI+ 0.0
    with 'bn' vs 0.878 with 'gn' on the e2e demo), and GroupNorm needs no
    cross-replica sync under data parallelism (SURVEY.md §5.8 flags exactly
    this switch).  Pass 'bn' to reproduce the reference configuration.
    """
    path_data, path_models = Path(path_data), Path(path_models)
    if (len(list((path_data / "train").glob("mask*"))) < 2
            or len(list((path_data / "val").glob("mask*"))) < 2):
        text_output("Not enough annotated images. Stop")
        return False
    if label_type not in ("boundary", "distance"):
        text_output(f"Unsupported label type for training: {label_type}")
        return False

    text_output("Start training")
    data = TrainingData.from_directory(path_data, label_type=label_type)

    for i in range(iterations):
        if should_stop():
            text_output("Stop training due to user interaction.")
            return False
        run_name = unique_path(path_models,
                               label_type + "_model_{:02d}.ckpt").stem
        if resume and i == 0:
            # continue the most recent interrupted run instead of starting a
            # fresh model name (SURVEY §5.4 mid-training resume)
            snaps = sorted(path_models.glob(
                f"{label_type}_model_*_state.train_state"))
            if snaps:
                run_name = snaps[-1].name[:-len("_state.train_state")]
                text_output(f"Resuming {run_name}")
        act_fun = "mish" if optimizer == "ranger" else "relu"
        filters = (64, 1024)
        bs = batch_size

        while True:
            cfg = TrainConfig(
                model=ModelConfig(
                    unet_type="DU" if label_type == "distance" else "U",
                    act_fun=act_fun, pool_method="conv",
                    normalization=normalization,
                    ch_out=1 if label_type == "distance" else 3,
                    filters=filters),
                label_type=label_type,
                loss="smooth_l1" if label_type == "distance" else "ce_dice",
                optimizer=optimizer, batch_size=bs, run_name=run_name,
                num_devices=num_devices, seed=seed + i,
                max_epochs=max_epochs,
                train_state_every=train_state_every)
            trainer = Trainer(cfg, path_models, text_output=text_output,
                              should_stop=should_stop,
                              progress=lambda p, i=i: progress(
                                  int((p + 100 * i) / iterations)))
            try:
                trainer.fit(data, print_output=print_output,
                            resume=resume and i == 0,
                            init_from=pretrained)
                break
            except Exception as exc:  # OOM ladder (reference :276-297)
                if not _is_oom(exc):
                    raise
                if bs > 8:
                    text_output(f"Model does not fit on RAM/VRAM. Reduce "
                                f"batch size from {bs} to 8")
                    bs = 8
                elif bs > 4:
                    text_output(f"Model does not fit on RAM/VRAM. Reduce "
                                f"batch size from {bs} to 4")
                    bs = 4
                elif filters[0] > 32:
                    text_output("Model does not fit on RAM/VRAM. Reduce "
                                "number of kernels")
                    filters = (32, 512)
                elif filters[-1] == 512:
                    text_output("Model does not fit on RAM/VRAM. Reduce "
                                "model depth")
                    filters = (32, 256)
                else:
                    text_output("Please, try again with smaller batch size or "
                                "reduce the crop size")
                    return False
        if trainer.stopped:
            return False
        _zip_trainset(path_data, path_models / f"{run_name}_trainset.zip")
        progress(int(100 * (i + 1) / iterations))
    return True


def _zip_trainset(path_data: Path, zip_path: Path) -> None:
    """Reproducibility snapshot: pack the training set (minus the test split)
    next to the model (reference train.py:265-274)."""
    import os
    import zipfile

    with zipfile.ZipFile(zip_path, "w") as z:
        for sub_dir in sorted(Path(path_data).iterdir()):
            if not sub_dir.is_dir() or sub_dir.stem == "test":
                continue
            for file in sorted(sub_dir.glob("*")):
                z.write(file,
                        arcname=os.path.join(path_data.stem, sub_dir.stem,
                                             file.name),
                        compress_type=zipfile.ZIP_DEFLATED)
