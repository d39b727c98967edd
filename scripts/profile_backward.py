"""Backward-pass attack matrix (VERDICT r2 item 2).

The flagship DUNet forward runs at 64% of v5e bf16 peak but the backward
only ~40%, capping the train step at ~175 crops/s/chip.  This script
slope-times value_and_grad of the training loss (fwd+bwd, no augment / no
optimizer) across a matrix of candidate levers:

  act:    mish (ranger default) vs relu — mish backward is a chain of
          transcendental VPU ops over every activation
  norm:   bn (reference default) vs gn — bn backward adds batch reductions
  remat:  none vs ConvBlock-level jax.checkpoint with two policies —
          trades recompute FLOPs for HBM traffic on the stored activations
  batch:  8 vs 16 — MXU utilization of the filter-gradient contractions

Usage: python scripts/profile_backward.py [keys ...]
Keys default to the full matrix; each row prints fwd_bwd ms/crop.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SIZE = 256


def slope_ms(run, args, n, batch, trials=3):
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


def build_model(act, norm, remat_policy, up_impl="conv"):
    from microbeseg_tpu.models.unet import DUNet

    # constructed directly (not via ModelConfig) so the diagnostic-only
    # act='linear' / norm='none' knobs are reachable
    return DUNet(ch_in=1, ch_out=1, pool_method="conv", act_fun=act,
                 normalization=norm, filters=(64, 1024),
                 remat_policy=remat_policy, up_impl=up_impl)


def fwd_bwd_ms(model, batch, rng):
    from microbeseg_tpu.training.losses import get_loss

    images = jnp.asarray(
        rng.standard_normal((batch, SIZE, SIZE, 1)).astype(np.float32))
    labels = {
        "border_label": jnp.asarray(
            rng.random((batch, SIZE, SIZE, 1)).astype(np.float32)),
        "cell_label": jnp.asarray(
            rng.random((batch, SIZE, SIZE, 1)).astype(np.float32))}
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images[:1], train=False))
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            (rng.standard_normal(s.shape) * 0.05).astype(s.dtype)), shapes)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    per_sample = jax.vmap(get_loss("smooth_l1", "distance"), in_axes=(0, 0))

    @jax.jit
    def chain(params, x, s, n):
        def body(_, carry):
            p, acc = carry

            def losses(p):
                var = {"params": p}
                if batch_stats:
                    var["batch_stats"] = batch_stats
                    preds, _ = model.apply(var, x + s * acc * 1e-9,
                                           train=True,
                                           mutable=["batch_stats"])
                else:
                    preds = model.apply(var, x + s * acc * 1e-9, train=True)
                return jnp.mean(per_sample(preds, labels))

            loss, grads = jax.value_and_grad(losses)(p)
            # data dependence through the params so iterations can't fuse
            p = jax.tree.map(lambda a, g: a - 1e-12 * g.astype(a.dtype),
                             p, grads)
            return p, acc + loss

        _, acc = jax.lax.fori_loop(0, n, body, (params, jnp.float32(0)))
        return acc

    return slope_ms(lambda p, s, n: chain(p, images, s, n), (params,),
                    n=4, batch=batch)


VARIANTS = {
    "base": dict(act="mish", norm="bn", remat=None, batch=16),
    "relu": dict(act="relu", norm="bn", remat=None, batch=16),
    "gn": dict(act="mish", norm="gn", remat=None, batch=16),
    "remat_dots": dict(act="mish", norm="bn", remat="dots", batch=16),
    "remat_none": dict(act="mish", norm="bn", remat="nothing", batch=16),
    "batch8": dict(act="mish", norm="bn", remat=None, batch=8),
    "relu_gn": dict(act="relu", norm="gn", remat=None, batch=16),
    # 2x2-stride-2 transposed convs rewritten as one matmul + depth-to-space
    # (identical numerics/params; see blocks._MatmulUp)
    "matmul_up": dict(act="mish", norm="bn", remat=None, batch=16,
                      up_impl="matmul"),
    # joint act+norm ablation: bounds what a fused Pallas act+norm block
    # could recover (gn - bare = joint cost incl. fusion glue)
    "bare": dict(act="linear", norm="none", remat=None, batch=16),
    "gn_linear": dict(act="linear", norm="gn", remat=None, batch=16),
    "none_mish": dict(act="mish", norm="none", remat=None, batch=16),
}


def main():
    keys = [k for k in sys.argv[1:] if k in VARIANTS] or list(VARIANTS)
    policies = {
        None: None,
        "dots": jax.checkpoint_policies.dots_saveable,
        "nothing": jax.checkpoint_policies.nothing_saveable,
    }
    rng = np.random.default_rng(0)
    for key in keys:
        v = VARIANTS[key]
        model = build_model(v["act"], v["norm"], policies[v["remat"]],
                            v.get("up_impl", "conv"))
        ms = fwd_bwd_ms(model, v["batch"], rng)
        print(f"{key:12s} act={v['act']:4s} norm={v['norm']:2s} "
              f"remat={str(v['remat']):7s} batch={v['batch']:2d} "
              f"up={v.get('up_impl', 'conv'):6s}: "
              f"fwd_bwd {ms:.3f} ms/crop ({1e3 / ms:.0f} crops/s)",
              flush=True)


if __name__ == "__main__":
    main()
