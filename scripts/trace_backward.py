"""Capture a jax.profiler trace of the flagship train fwd+bwd and print the
per-op time breakdown (aggregated by fusion/op name).

The chain runs n iterations of value_and_grad inside one jit (same traced
chain as scripts/profile_backward.py) so the axon memoization cannot skip
work; the trace is parsed from the TensorBoard trace.json.gz.

Usage: python scripts/trace_backward.py [n_iters] [--fwd-only]
"""

import glob
import gzip
import json
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

SIZE = 256
BATCH = 16


def build_chain(fwd_only=False, return_lowered=False):
    from microbeseg_tpu.config import ModelConfig
    from microbeseg_tpu.models.unet import build_unet
    from microbeseg_tpu.training.losses import get_loss

    model = build_unet(ModelConfig(act_fun="mish", normalization="bn"))
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((BATCH, SIZE, SIZE, 1)).astype(np.float32))
    labels = {
        "border_label": jnp.asarray(
            rng.random((BATCH, SIZE, SIZE, 1)).astype(np.float32)),
        "cell_label": jnp.asarray(
            rng.random((BATCH, SIZE, SIZE, 1)).astype(np.float32))}
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images[:1], train=False))
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            (rng.standard_normal(s.shape) * 0.05).astype(s.dtype)), shapes)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    per_sample = jax.vmap(get_loss("smooth_l1", "distance"), in_axes=(0, 0))

    @jax.jit
    def chain(params, x, s, n):
        def body(_, carry):
            p, acc = carry

            def losses(p):
                var = {"params": p, "batch_stats": batch_stats}
                preds, _ = model.apply(var, x + s * acc * 1e-9, train=True,
                                       mutable=["batch_stats"])
                return jnp.mean(per_sample(preds, labels))

            if fwd_only:
                loss = losses(p)
                grads = p
            else:
                loss, grads = jax.value_and_grad(losses)(p)
            p = jax.tree.map(lambda a, g: a - 1e-12 * g.astype(a.dtype),
                             p, grads)
            return p, acc + loss

        _, acc = jax.lax.fori_loop(0, n, body, (params, jnp.float32(0)))
        return acc

    run = lambda s, n: chain(params, images, s, n)  # noqa: E731
    if return_lowered:
        return run, chain.lower(params, images, jnp.float32(1e-9),
                                jnp.int32(8))
    return run


def parse_trace(tracedir, n_iters):
    path = sorted(glob.glob(f"{tracedir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # keep only device-lane events (XLA ops); heuristically: pid lanes whose
    # names are HLO-ish.  Aggregate by event name.
    agg = defaultdict(float)
    for e in events:
        agg[e["name"]] += e["dur"]
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    total = sum(v for _, v in rows)
    print(f"total traced op time: {total / 1e3:.1f} ms over {n_iters} iters "
          f"({total / 1e3 / n_iters / BATCH:.3f} ms/crop)")
    print(f"{'us_total':>10s} {'us/iter':>9s} {'%':>5s}  name")
    for name, us in rows[:60]:
        print(f"{us:10.0f} {us / n_iters:9.1f} {100 * us / total:5.1f}  "
              f"{name[:140]}")


def main():
    args = [a for a in sys.argv[1:]]
    fwd_only = "--fwd-only" in args
    n = int(next((a for a in args if a.isdigit()), "8"))
    run = build_chain(fwd_only)
    float(run(1e-9, 2))  # compile
    tracedir = "/tmp/jaxtrace_bwd"
    with jax.profiler.trace(tracedir):
        float(run(1e-8, n))
    parse_trace(tracedir, n)


if __name__ == "__main__":
    main()
