"""Optimizers as composable optax transforms.

The reference vendors the Ranger optimizer (RAdam + Lookahead + Gradient
Centralization; reference: src/training/ranger2020.py:43-206, invoked
train.py:394-426) and uses Adam(amsgrad) otherwise (train.py:379-385).
Here Ranger is rebuilt the JAX way: three small GradientTransformations
chained — gradient centralization on the raw grads (gc_loc=True semantics,
reference ranger2020.py:149-150), optax's RAdam rectification (threshold 5 ==
N_sma_threshhold), and a lookahead slow-weight interpolation every k steps
with checkpointable state (reference ranger2020.py:198-206).

Learning rates are injected via ``optax.inject_hyperparams`` so the host-side
ReduceLROnPlateau / cosine schedules (see schedules.py) can set them between
epochs without recompiling the train step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from microbeseg_tpu.config import TrainConfig


def gradient_centralization() -> optax.GradientTransformation:
    """Subtract the per-output-channel mean from multi-dim gradients.

    Matches reference centralized_gradient (ranger2020.py:31-40) with
    use_gc=True, gc_conv_only=False: any grad with ndim > 1 is centralized.
    Torch weights are (out, ...); flax kernels are (..., out), so the mean is
    over all axes except the last.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def gc(g):
            if g.ndim > 1:
                axes = tuple(range(g.ndim - 1))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g

        return jax.tree.map(gc, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


class LookaheadState(NamedTuple):
    step: jnp.ndarray
    slow: optax.Params


def lookahead(alpha: float = 0.5, k: int = 6) -> optax.GradientTransformation:
    """Lookahead slow-weight interpolation as a terminal transform.

    Every k steps the emitted update lands the params on
    slow + alpha * (fast_new - slow) and refreshes the slow copy
    (reference ranger2020.py:198-206).  Must be the last element of the chain
    (it needs the final, lr-scaled updates) and requires params.
    """

    def init_fn(params):
        # jnp.copy, not asarray: the slow weights must not alias the live
        # params, or jit buffer donation would donate the same buffer twice.
        return LookaheadState(step=jnp.zeros([], jnp.int32),
                              slow=jax.tree.map(jnp.copy, params))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("lookahead requires params")
        step = state.step + 1
        sync = (step % k) == 0

        def synced(args):
            updates, params, slow = args
            new_u = jax.tree.map(
                lambda u, p, s: s + alpha * (p + u - s) - p,
                updates, params, slow)
            new_s = jax.tree.map(
                lambda u, p, s: s + alpha * (p + u - s),
                updates, params, slow)
            return new_u, new_s

        def passthrough(args):
            updates, params, slow = args
            return updates, slow

        # lax.cond so the 5-of-6 non-sync steps skip the extra full-parameter
        # passes (the slow copy is ~185 MB of HBM traffic for the flagship)
        new_updates, new_slow = jax.lax.cond(
            sync, synced, passthrough, (updates, params, state.slow))
        return new_updates, LookaheadState(step=step, slow=new_slow)

    return optax.GradientTransformation(init_fn, update_fn)


def ranger(learning_rate: float, b1: float = 0.95, b2: float = 0.999,
           eps: float = 1e-6, threshold: float = 5.0,
           alpha: float = 0.5, k: int = 6,
           use_gc: bool = True) -> optax.GradientTransformation:
    """RAdam + Lookahead + GC (reference call site: train.py:414-419)."""
    chain = []
    if use_gc:
        chain.append(gradient_centralization())
    chain.append(optax.scale_by_radam(b1=b1, b2=b2, eps=eps,
                                      threshold=threshold))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    chain.append(lookahead(alpha=alpha, k=k))
    return optax.chain(*chain)


def adam_amsgrad(learning_rate: float) -> optax.GradientTransformation:
    """Adam with amsgrad, reference hyperparams (train.py:380-385)."""
    return optax.amsgrad(learning_rate, b1=0.9, b2=0.999, eps=1e-8)


def build_optimizer(cfg: TrainConfig, second_run: bool = False):
    """Optimizer with injected lr (settable via opt_state.hyperparams).

    Returns (optax transformation, initial_lr).
    """
    if cfg.optimizer == "adam":
        lr = cfg.adam_lr
        tx = optax.inject_hyperparams(adam_amsgrad)(learning_rate=lr)
    elif cfg.optimizer == "ranger":
        lr = cfg.ranger_lr * (cfg.ranger_finetune_factor if second_run else 1.0)
        tx = optax.inject_hyperparams(ranger)(
            learning_rate=lr, alpha=cfg.lookahead_alpha, k=cfg.lookahead_k)
    else:
        raise ValueError(f"Optimizer not known: {cfg.optimizer!r}")
    return tx, lr


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in-place on an optimizer state."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=opt_state.hyperparams["learning_rate"].dtype)
    return opt_state
