"""Typed configuration system.

Replaces the reference's ad-hoc ``train_configs`` dict (reference:
src/training/train.py:184-194) and per-model JSON sidecar (reference:
src/utils/utils.py:94-107) with frozen dataclasses, while keeping the sidecar
JSON format interoperable: ``ModelConfig.to_sidecar()`` emits the same keys the
reference's inference/eval paths consume (``architecture``, ``batch_size``,
``label_type``, ``loss``, ``num_gpus``, ``optimizer``, ``run_name``,
``max_epochs``; reference: src/inference/infer.py:83-86,
src/evaluation/eval.py:105-106, infer_script_local.py:38-39).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Sequence, Tuple

# Padding bucket table: the reference's "tested shapes" (reference:
# src/utils/utils.py:137-138).  Inputs are padded up to the next bucket so XLA
# compiles one executable per bucket instead of per image size.
PAD_BUCKETS: Tuple[int, ...] = (
    64, 128, 256, 320, 512, 768, 1024, 1280, 1408, 1600, 1920, 2048, 2240,
    2560, 3200, 4096, 4480, 6080, 8192,
)

LABEL_TYPES = ("distance", "boundary", "border", "adapted_border", "j4",
               "cell_dist", "cell_dist_clipped")
ACTIVATIONS = ("relu", "leakyrelu", "elu", "mish")
NORMALIZATIONS = ("bn", "gn", "in")
POOL_METHODS = ("conv", "max")
OPTIMIZERS = ("adam", "ranger")
LOSSES = ("smooth_l1", "l1", "l2", "ce_dice", "ce")


@dataclass(frozen=True)
class ModelConfig:
    """Architecture of the (D)U-Net (reference: src/utils/unets.py:8-57)."""

    unet_type: str = "DU"            # 'DU' = shared encoder + 2 decoders, 'U' = 1 decoder
    act_fun: str = "relu"
    pool_method: str = "conv"
    normalization: str = "bn"
    ch_in: int = 1
    ch_out: int = 1                   # 1 for distance, 3 for boundary
    filters: Tuple[int, int] = (64, 1024)

    def __post_init__(self):
        if self.unet_type not in ("DU", "U"):
            raise ValueError(f"unknown unet_type {self.unet_type!r}")
        if self.act_fun not in ACTIVATIONS:
            raise ValueError(f"unknown act_fun {self.act_fun!r}")
        if self.normalization not in NORMALIZATIONS:
            raise ValueError(f"unknown normalization {self.normalization!r}")
        if self.pool_method not in POOL_METHODS:
            raise ValueError(f"unknown pool_method {self.pool_method!r}")

    @property
    def depth(self) -> int:
        """Number of encoder levels (filters doubling f0 -> f1)."""
        n, f = 1, self.filters[0]
        while f < self.filters[1]:
            f *= 2
            n += 1
        return n

    @property
    def architecture(self) -> tuple:
        """Reference-format architecture tuple ('DU', 'conv', act, norm, filters)."""
        return (self.unet_type, self.pool_method, self.act_fun,
                self.normalization, list(self.filters))

    @classmethod
    def from_architecture(cls, arch: Sequence, label_type: str = "distance") -> "ModelConfig":
        """Build from a reference-format architecture tuple."""
        unet_type, pool_method, act_fun, normalization, filters = arch
        return cls(unet_type=unet_type, act_fun=act_fun, pool_method=pool_method,
                   normalization=normalization,
                   ch_out=1 if label_type == "distance" else 3,
                   filters=tuple(filters))


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference defaults: src/training/train.py)."""

    model: ModelConfig = field(default_factory=ModelConfig)
    label_type: str = "distance"
    loss: str = "smooth_l1"           # reference: train.py:191
    optimizer: str = "ranger"
    batch_size: int = 4               # global batch (reference headless default: train_script.py:18)
    run_name: str = "distance_model_01"
    max_epochs: Optional[int] = None  # None -> heuristic from dataset size
    seed: int = 0
    # Optimizer settings (reference: train.py:379-426)
    adam_lr: float = 8e-4
    ranger_lr: float = 6e-3
    ranger_finetune_factor: float = 0.09
    lookahead_alpha: float = 0.5
    lookahead_k: int = 6
    # Data-parallel mesh axis size; None -> all visible devices.
    num_devices: Optional[int] = None
    # Compute dtype for the model forward/backward ('bfloat16' or 'float32').
    compute_dtype: str = "bfloat16"
    # Save a full resumable training snapshot (params + optimizer state +
    # RNG + scheduler) every N epochs; 0 disables (SURVEY §5.4 — the
    # reference has no mid-training resume).
    train_state_every: int = 0

    def __post_init__(self):
        if self.label_type not in LABEL_TYPES:
            raise ValueError(f"unknown label_type {self.label_type!r}")
        if self.optimizer not in OPTIMIZERS:
            raise ValueError(f"unknown optimizer {self.optimizer!r}")
        if self.loss not in LOSSES:
            raise ValueError(f"unknown loss {self.loss!r}")


@dataclass(frozen=True)
class InferConfig:
    """Inference settings (reference: infer_script.py:15-30, infer.py:22-61)."""

    th_cell: float = 0.10             # reference default: infer_script.py:20
    th_seed: float = 0.45
    apply_clahe: bool = False
    scale_factor: float = 1.0
    # frames batched on device (reference: hard-coded 1).  16 measured best
    # per-crop on v5e: fwd 1.24 ms/crop vs 1.44 at batch 8, 1.28 at 32.
    batch_size: int = 16
    # Sliding-window tiling (first-class here; "not implemented yet" in reference).
    use_tiling: bool = False
    tile_size: int = 512
    tile_overlap: int = 64
    # int8 forward on the large-spatial conv layers (v5e double-rate MXU
    # path; beyond-reference serving mode — see models/blocks.QuantConv).
    quantize: bool = False
    # Test-time augmentation (beyond reference): average predictions over
    # the shape-preserving dihedral transforms (4 flip variants, all 8 of
    # D4 when the padded shape is square — the same group the training
    # augmentation samples, mytransforms.py:129-230).  ~4-8x forward cost.
    tta: bool = False


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation grid (reference: src/evaluation/eval.py:127-131)."""

    th_cells: Tuple[float, ...] = (0.05, 0.075, 0.10, 0.125)
    th_seeds: Tuple[float, ...] = (0.35, 0.45)
    batch_size: int = 8
    save_raw_pred: bool = False
    border_width: int = 10            # border correction inset (reference: utils.py:25)
    # coarse-to-fine threshold search (beyond reference): after the coarse
    # grid, evaluate halved-spacing neighbors around the running best for
    # this many rounds (0 = reference behavior, grid only)
    refine_steps: int = 0
    # evaluate with test-time augmentation (InferConfig.tta)
    tta: bool = False
    # evaluate ALL given models as ONE ensemble (averaged predictions,
    # InferenceEngine.from_checkpoints) instead of one row per model
    ensemble: bool = False
    # extra per-image metric columns ('aji', 'dice', 'pq') computed at the
    # AJI+-selected best thresholds (default off; the reference vendors
    # these in stats_utils.py:16-284 but never surfaces them — model
    # selection stays AJI+-driven either way, eval.py:261)
    extra_metrics: Tuple[str, ...] = ()

    def __post_init__(self):
        bad = set(self.extra_metrics) - {"aji", "dice", "pq"}
        if bad:
            raise ValueError(f"unknown extra_metrics {sorted(bad)} "
                             "(choose from aji, dice, pq)")


def get_max_epochs(n_samples: int, crop_size: int) -> int:
    """Epoch-budget heuristic (reference: src/training/train.py:579-606)."""
    if n_samples >= 1000:
        max_epochs = 200
    elif n_samples >= 500:
        max_epochs = 240
    elif n_samples >= 200:
        max_epochs = 320
    elif n_samples >= 100:
        max_epochs = 400
    elif n_samples >= 50:
        max_epochs = 480
    else:
        max_epochs = 560
    max_epochs *= (320 / crop_size) ** 0.5
    return int(max_epochs - max_epochs % 20)


# ---------------------------------------------------------------------------
# JSON sidecar interop
# ---------------------------------------------------------------------------

# Human-readable description of the on-device augmentation pipeline, stored
# under the sidecar's 'transforms' key like the reference stores the repr of
# its Compose (reference train.py:192, mytransforms.py:24-32).
AUGMENTATION_TRANSFORMS = (
    "Compose(Flip(p=1.0, D4), Contrast(p=0.45: clahe|stretch|gamma), "
    "Scaling(p=0.25, 0.85-1.15), Rotate(p=0.25, ±45°), "
    "Blur(p=0.3, σ 1-2), Noise(p=0.3, σ 1-5%), Normalize([-1,1]))")


def write_sidecar(cfg: TrainConfig, path: Path, extra: Optional[dict] = None) -> Path:
    """Write the reference-compatible model JSON sidecar next to a checkpoint.

    Keys mirror reference src/utils/utils.py:94-107 consumers.
    """
    payload = {
        "architecture": cfg.model.architecture,
        "batch_size": cfg.batch_size,
        "label_type": cfg.label_type,
        "loss": cfg.loss,
        "num_gpus": cfg.num_devices or 1,   # key kept for interop; devices here
        "optimizer": cfg.optimizer,
        "run_name": cfg.run_name,
        "transforms": AUGMENTATION_TRANSFORMS,
        "max_epochs": cfg.max_epochs,
        "framework": "microbeseg_tpu",
        "compute_dtype": cfg.compute_dtype,
        "seed": cfg.seed,
    }
    if extra:
        payload.update(extra)
    out = Path(path) / f"{cfg.run_name}.json"
    with open(out, "w", encoding="utf-8") as f:
        json.dump(payload, f, ensure_ascii=False, indent=2)
    return out


def read_sidecar(path: Path) -> dict:
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def train_config_from_sidecar(sidecar: dict) -> TrainConfig:
    """Rebuild a TrainConfig from a sidecar dict (ours or the reference's)."""
    model = ModelConfig.from_architecture(sidecar["architecture"],
                                          label_type=sidecar["label_type"])
    return TrainConfig(
        model=model,
        label_type=sidecar["label_type"],
        loss=sidecar.get("loss", "smooth_l1"),
        optimizer=sidecar.get("optimizer", "ranger"),
        batch_size=sidecar.get("batch_size", 4),
        run_name=sidecar.get("run_name", "model"),
        max_epochs=sidecar.get("max_epochs"),
        seed=sidecar.get("seed", 0),
        compute_dtype=sidecar.get("compute_dtype", "bfloat16"),
    )


def asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)
