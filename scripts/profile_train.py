"""Break down the train-step cost on the real TPU chip.

Times each component of the jitted train step with the slope protocol from
bench.py (chained fori_loop with a data dependence; per-crop ms is the
(n, 2n) runtime slope so constant dispatch/fetch overhead cancels).

Stages:
  augment      full augment_batch (D4 + contrast + affine + blur + noise)
  aug:contrast contrast family only (CLAHE | stretch | gamma via lax.switch;
               under vmap ALL branches execute every step)
  aug:clahe    CLAHE alone (batch of 8)
  aug:affine   scale+rotate resample (image order-1 + two labels)
  aug:blur     dynamic-sigma separable blur
  fwd_bwd      value_and_grad of the DUNet loss on pre-augmented input
  ranger       optimizer transform alone (tx.update + apply_updates)
  train        the full step (augment + fwd/bwd + ranger)

Usage: python scripts/profile_train.py [stage ...]   (default: all cheap ones)
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SIZE = 256
BATCH = 8


def slope_ms(run, args, n, trials=3, batch=BATCH):
    float(run(*args, 1e-9, n))
    float(run(*args, 1e-9, 2 * n))
    slopes = []
    for t in range(trials):
        s = 1e-8 * (t + 1)
        t0 = time.perf_counter()
        float(run(*args, s, n))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(*args, s, 2 * n))
        d2 = time.perf_counter() - t0
        slopes.append((d2 - d1) / (n * batch))
    return 1e3 * float(np.median(slopes))


def chain(body_fn):
    """Wrap a (carry_array, key) -> array body into a slope-timable chain."""
    @jax.jit
    def run(x, key, s, n):
        def body(i, carry):
            x, acc = carry
            k = jax.random.fold_in(key, i)
            out = body_fn(x + s, k)
            return x + s * out[0, 0, 0, 0] * 1e-9, acc + out.mean()
        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc
    return lambda x, s, n: run(x, jax.random.PRNGKey(0), s, n)


def main(stages):
    from microbeseg_tpu.ops.augment import (augment_batch, clahe, _contrast,
                                            _affine_resample)
    from microbeseg_tpu.ops.filters import gaussian_blur_dynamic

    rng = np.random.default_rng(0)
    raw = jnp.asarray(
        rng.integers(0, 65535, (BATCH, SIZE, SIZE, 1)).astype(np.float32))
    labels = {
        "border_label": jnp.asarray(
            rng.random((BATCH, SIZE, SIZE, 1)).astype(np.float32)),
        "cell_label": jnp.asarray(
            rng.random((BATCH, SIZE, SIZE, 1)).astype(np.float32)),
    }
    results = {}

    if "augment" in stages:
        def aug(x, k):
            img, _ = augment_batch(k, x, labels, "distance")
            return img
        results["augment"] = slope_ms(chain(aug), (raw,), n=20)

    if "aug:contrast" in stages:
        def contrast(x, k):
            ks = jax.random.split(k, BATCH)
            return jax.vmap(_contrast)(ks, x)
        results["aug:contrast"] = slope_ms(chain(contrast), (raw,), n=20)

    if "aug:clahe" in stages:
        def cl(x, k):
            return jax.vmap(lambda im: clahe(im[..., 0] / 65535.0)[..., None])(x)
        results["aug:clahe"] = slope_ms(chain(cl), (raw,), n=20)

    if "aug:affine" in stages:
        def aff(x, k):
            ang = jax.random.uniform(k, (BATCH,), minval=-0.7, maxval=0.7)
            sc = jnp.ones((BATCH,)) * 1.05
            img = jax.vmap(lambda im, a, s: _affine_resample(im, a, s, s, 1))(
                x, ang, sc)
            l1 = jax.vmap(lambda im, a, s: _affine_resample(im, a, s, s, 1))(
                labels["border_label"], ang, sc)
            l2 = jax.vmap(lambda im, a, s: _affine_resample(im, a, s, s, 1))(
                labels["cell_label"], ang, sc)
            return img + l1 + l2
        results["aug:affine"] = slope_ms(chain(aff), (raw,), n=20)

    if "aug:blur" in stages:
        def blur(x, k):
            sig = jax.random.uniform(k, (BATCH,), minval=1.0, maxval=2.0)
            return jax.vmap(lambda im, s: gaussian_blur_dynamic(im, s))(x, sig)
        results["aug:blur"] = slope_ms(chain(blur), (raw,), n=20)

    if any(s in stages for s in ("fwd_train", "fwd_bwd", "ranger", "train")):
        import optax
        from microbeseg_tpu.config import ModelConfig, TrainConfig
        from microbeseg_tpu.models.unet import build_unet
        from microbeseg_tpu.training.losses import get_loss
        from microbeseg_tpu.training.optimizers import build_optimizer

        model = build_unet(ModelConfig())
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), raw[:1], train=False))
        nprng = np.random.default_rng(0)
        variables = jax.tree.map(
            lambda s: jnp.asarray(
                (nprng.standard_normal(s.shape) * 0.05).astype(s.dtype)),
            shapes)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        cfg = TrainConfig(optimizer="ranger", batch_size=BATCH)
        loss_fn = get_loss(cfg.loss, cfg.label_type)
        per_sample = jax.vmap(loss_fn, in_axes=(0, 0))
        tx, _ = build_optimizer(cfg)
        opt_state = tx.init(params)

        def losses(p, img):
            var = {"params": p}
            if batch_stats:
                var["batch_stats"] = batch_stats
                preds, _ = model.apply(var, img, train=True,
                                       mutable=["batch_stats"])
            else:
                preds = model.apply(var, img, train=True)
            return jnp.mean(per_sample(preds, labels))

        if "fwd_train" in stages:
            @jax.jit
            def ft_chain(params, x, s, n):
                def body(_, carry):
                    x, acc = carry
                    loss = losses(params, x)
                    return x + s * loss * 1e-9, acc + loss
                _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
                return acc
            results["fwd_train"] = slope_ms(
                lambda p, s, n: ft_chain(p, raw, s, n), (params,), n=5)

        if "fwd_bwd" in stages:
            @jax.jit
            def fb_chain(params, x, s, n):
                def body(_, carry):
                    x, acc = carry
                    loss, grads = jax.value_and_grad(losses)(params, x)
                    # consume grads so the backward pass survives DCE
                    gsum = sum(g.mean() for g in
                               jax.tree_util.tree_leaves(grads))
                    return x + s * (loss + gsum) * 1e-9, acc + loss + gsum
                _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
                return acc
            results["fwd_bwd"] = slope_ms(
                lambda p, s, n: fb_chain(p, raw, s, n), (params,), n=5)

        if "fwd_bwd_remat" in stages:
            relosses = jax.checkpoint(losses)

            @jax.jit
            def fbr_chain(params, x, s, n):
                def body(_, carry):
                    x, acc = carry
                    loss, grads = jax.value_and_grad(relosses)(params, x)
                    gsum = sum(g.mean() for g in
                               jax.tree_util.tree_leaves(grads))
                    return x + s * (loss + gsum) * 1e-9, acc + loss + gsum
                _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
                return acc
            results["fwd_bwd_remat"] = slope_ms(
                lambda p, s, n: fbr_chain(p, raw, s, n), (params,), n=5)

        if "ranger" in stages:
            @jax.jit
            def opt_chain(params, opt_state, s, n):
                def body(_, carry):
                    params, opt_state, acc = carry
                    grads = jax.tree.map(lambda p: p * s, params)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state,
                            acc + jax.tree_util.tree_leaves(params)[0].mean())
                params, opt_state, acc = jax.lax.fori_loop(
                    0, n, body, (params, opt_state, jnp.float32(0)))
                return acc
            results["ranger"] = slope_ms(
                lambda p, o, s, n: opt_chain(p, o, s, n),
                (params, opt_state), n=5)

        if "train" in stages:
            @jax.jit
            def train_chain(params, opt_state, key, s, n):
                def step(i, carry):
                    params, opt_state, acc = carry
                    k = jax.random.fold_in(key, i)
                    aug_img, aug_lab = augment_batch(k, raw + s, labels,
                                                     "distance")

                    def lo(p):
                        var = {"params": p}
                        if batch_stats:
                            var["batch_stats"] = batch_stats
                            preds, _ = model.apply(var, aug_img, train=True,
                                                   mutable=["batch_stats"])
                        else:
                            preds = model.apply(var, aug_img, train=True)
                        return jnp.mean(jax.vmap(loss_fn)(preds, aug_lab))

                    loss, grads = jax.value_and_grad(lo)(params)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return params, opt_state, acc + loss
                _, _, acc = jax.lax.fori_loop(
                    0, n, step, (params, opt_state, jnp.float32(0)))
                return acc
            results["train"] = slope_ms(
                lambda p, o, s, n: train_chain(p, o, jax.random.PRNGKey(0),
                                               s, n),
                (params, opt_state), n=5)

    for k, v in results.items():
        print(f"{k:14s} {v:8.3f} ms/crop")


if __name__ == "__main__":
    all_stages = ["augment", "aug:contrast", "aug:clahe", "aug:affine",
                  "aug:blur", "fwd_bwd", "ranger", "train"]
    main(sys.argv[1:] or all_stages[:5])
