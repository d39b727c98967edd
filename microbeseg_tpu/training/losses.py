"""Loss functions (reference: src/training/losses.py).

- distance method: per-head SmoothL1/L1/L2 on (border, cell) regressions,
  summed (reference train.py:478-482).
- boundary method: cross-entropy or CE + 0.5 * channel-weighted dice
  (reference losses.py:71-96).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """torch.nn.SmoothL1Loss (mean reduction, beta=1)."""
    d = jnp.abs(pred - target)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return jnp.mean(loss)


def l1(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2(pred, target):
    return jnp.mean((pred - target) ** 2)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """CE over channel-last logits (B, H, W, C) vs int labels (B, H, W)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def dice_loss(probs: jnp.ndarray, target: jnp.ndarray,
              smooth: float = 1.0) -> jnp.ndarray:
    """Dice on probabilities (reference losses.py:40-68, use_sigmoid=False)."""
    p = probs.reshape(-1)
    t = target.reshape(-1)
    inter = jnp.sum(p * t)
    return 1.0 - (2.0 * inter + smooth) / (jnp.sum(t * t) + jnp.sum(p * p) + smooth)


def ce_dice(logits: jnp.ndarray, labels: jnp.ndarray,
            num_classes: int = 3) -> jnp.ndarray:
    """CE + 0.5 * sum_c c * dice_c for classes 1..C-1 (reference :71-96)."""
    ce = cross_entropy(logits, labels)
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=probs.dtype)
    dice = 0.0
    for c in range(1, num_classes):
        dice = dice + c * dice_loss(probs[..., c], onehot[..., c])
    return ce + 0.5 * dice


def get_batch_loss(loss_function: str, label_type: str) -> Callable:
    """Returns loss(pred, batch, weights) -> weighted loss SUM over the real
    samples of a batch (i.e. reference_batch_loss * n_real, matching the
    reference's ``running_loss += loss.item() * batch_size`` accounting,
    train.py:493-495).

    ``weights`` are 1 for real samples and 0 for static-shape padding slots.
    The ce_dice dice term is computed over the FLATTENED WHOLE BATCH
    (reference losses.py:40-68 flattens batch tensors), which a per-sample
    decomposition cannot express — padded slots are zeroed out of all three
    dice sums, so they contribute nothing.
    """
    if label_type == "boundary" and loss_function == "ce_dice":
        def batch_ce_dice(logits, batch, weights, num_classes: int = 3):
            labels = batch["label"]
            labels = labels[..., 0] if labels.shape[-1] == 1 else labels
            ce_per = jax.vmap(cross_entropy)(logits, labels)
            n_real = jnp.sum(weights)
            probs = jax.nn.softmax(logits, axis=-1)
            onehot = jax.nn.one_hot(labels, num_classes, dtype=probs.dtype)
            w = weights[:, None, None, None]
            dice = 0.0
            for c in range(1, num_classes):
                dice = dice + c * dice_loss(probs[..., c] * w[..., 0],
                                            onehot[..., c] * w[..., 0])
            return jnp.sum(ce_per * weights) + 0.5 * dice * n_real
        return batch_ce_dice

    per_sample_fn = get_loss(loss_function, label_type)

    def batch_loss(pred, batch, weights):
        per = jax.vmap(per_sample_fn)(pred, batch)
        return jnp.sum(per * weights)

    return batch_loss


def get_loss(loss_function: str, label_type: str) -> Callable:
    """Returns loss(pred, batch) -> scalar.

    distance: pred = (border_pred, cell_pred), batch has 'border_label' /
    'cell_label'.  boundary: pred = logits (B,H,W,3), batch has 'label'.
    """
    if label_type == "boundary":
        def _squeeze(lab):
            # labels arrive (..., H, W, 1) from the data pipeline
            return lab[..., 0] if lab.shape[-1] == 1 else lab

        if loss_function == "ce_dice":
            return lambda logits, batch: ce_dice(logits, _squeeze(batch["label"]))
        if loss_function == "ce":
            return lambda logits, batch: cross_entropy(logits, _squeeze(batch["label"]))
        raise ValueError(f"Loss unknown: {loss_function!r}")
    if label_type == "distance":
        base = {"l1": l1, "l2": l2, "smooth_l1": smooth_l1}.get(loss_function)
        if base is None:
            raise ValueError(f"Loss unknown: {loss_function!r}")

        def distance_loss(pred, batch):
            border_pred, cell_pred = pred
            return (base(border_pred, batch["border_label"])
                    + base(cell_pred, batch["cell_label"]))

        return distance_loss
    raise ValueError(f"Label type unknown: {label_type!r}")
