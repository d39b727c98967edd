"""Inference-pipeline throughput across the reference crop sizes.

Measures DUNet forward + fused post-processing (auto method: packed-key
Pallas flood) per crop at each size with the slope protocol (see bench.py).
Exercises the non-tile-multiple (320), large (512/1024/2048) and the tiled
4096^2 engine path (device-stitched sliding window) end to end.

``--small`` restricts to the original <=512 sizes; ``--tiled-only`` runs
just the 4096^2 engine case.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# (size, batch): batches follow the engine's area-scaling rule
# (InferenceEngine._device_batch — 16 at 256^2, 2x headroom factor)
CONFIGS = [(128, 32), (256, 16), (320, 16), (512, 8), (1024, 2), (2048, 1)]


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


def blobs(rng, n, size):
    yy, xx = np.mgrid[0:size, 0:size]
    cells = np.zeros((n, size, size), np.float32)
    for i in range(n):
        cell = np.zeros((size, size), np.float32)
        for _ in range(max(8, 24 * size * size // (256 * 256))):
            cy, cx = rng.integers(10, size - 10, 2)
            r = rng.integers(6, 14)
            d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
            cell = np.maximum(cell, np.clip(1 - d / r, 0, 1))
        cells[i] = cell
    borders = np.clip(cells - np.roll(cells, 3, axis=1), 0, 0.3)
    return jnp.asarray(borders), jnp.asarray(cells)


def tiled_case(rng):
    """End-to-end engine throughput on a 4096^2 frame through the tiled
    sliding-window path (512^2 tiles, 64-px halo, device stitching, full-
    frame post-processing).  Wall-clock over distinct frames — content
    differs per call, so the axon memoization cannot short-circuit; the
    per-call dispatch latency is genuinely part of this host-orchestrated
    path's cost."""
    from microbeseg_tpu.config import InferConfig, ModelConfig
    from microbeseg_tpu.inference.engine import InferenceEngine
    from microbeseg_tpu.models.unet import build_unet

    size = 4096
    model = build_unet(ModelConfig())
    sample = jnp.zeros((1, 512, 512, 1), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), sample, train=False))
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            (rng.standard_normal(s.shape) * 0.05).astype(s.dtype)), shapes)
    engine = InferenceEngine(model, variables,
                             cfg=InferConfig(use_tiling=True, tile_size=512,
                                             tile_overlap=64))
    # cell-like content so post-processing does real seed/flood work (flat
    # noise produces zero seeds and the flood early-exits, undercounting)
    yy, xx = np.mgrid[0:512, 0:512]
    base = np.zeros((512, 512), np.float32)
    for _ in range(160):
        cy, cx = rng.integers(12, 500, 2)
        r = rng.integers(6, 14)
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        base = np.maximum(base, np.clip(1 - d / r, 0, 1))
    reps = size // 512
    frames = np.stack([
        np.clip(np.tile(base, (reps, reps)) * 30000 + 3000
                + rng.standard_normal((size, size)) * 800, 0, 65535)
        for _ in range(3)]).astype(np.uint16)
    engine.segment(frames[0])  # compile
    t0 = time.perf_counter()
    for i in (1, 2):
        engine.segment(frames[i])
    per_frame = (time.perf_counter() - t0) / 2
    eq_crops = (size / 256) ** 2  # 256^2-crop equivalents per frame
    print(f"{size}^2 tiled (512^2 tiles + device stitch): "
          f"{per_frame:.2f} s/frame -> "
          f"{eq_crops / per_frame:.0f} 256^2-equiv crops/s/chip")


def main():
    from microbeseg_tpu.config import ModelConfig
    from microbeseg_tpu.models.unet import build_unet
    from microbeseg_tpu.ops.postprocessing import distance_postprocessing

    rng = np.random.default_rng(0)
    if "--tiled-only" in sys.argv:
        tiled_case(rng)
        return
    configs = [c for c in CONFIGS
               if c[0] <= 512 or "--small" not in sys.argv]
    model = build_unet(ModelConfig())
    for size, batch in configs:
        images = jnp.asarray(
            rng.standard_normal((batch, size, size, 1)).astype(np.float32))
        shapes = jax.eval_shape(
            lambda im=images: model.init(jax.random.PRNGKey(0), im[:1],
                                         train=False))
        variables = jax.tree.map(
            lambda s: jnp.asarray(
                (rng.standard_normal(s.shape) * 0.05).astype(s.dtype)),
            shapes)

        @jax.jit
        def fwd_chain(variables, x, s, n):
            def body(_, carry):
                x, acc = carry
                border, cell = model.apply(variables, x, train=False)
                return (x + s * cell,
                        acc + border[0, 0, 0, 0] + cell[0, 0, 0, 0])
            _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return acc

        fwd = slope_ms(lambda v, x, s, n: fwd_chain(v, x, s, n),
                       (variables, images), n=8, batch=batch)

        borders, cells = blobs(rng, batch, size)

        @jax.jit
        def post_chain(cells, borders, s, n):
            def body(_, carry):
                c, acc = carry
                masks = jax.vmap(lambda b, cc: distance_postprocessing(
                    b, cc, 0.45, 0.10))(borders, c)
                return c + s, acc + masks.astype(jnp.float32).sum()
            _, acc = jax.lax.fori_loop(0, n, body, (cells, jnp.float32(0)))
            return acc

        post = slope_ms(lambda c, b, s, n: post_chain(c, b, s, n),
                        (cells, borders), n=15 if size <= 512 else 4,
                        batch=batch)
        total = fwd + post
        print(f"{size}^2 (batch {batch}): fwd {fwd:.2f} + post {post:.2f} "
              f"= {total:.2f} ms/crop -> {1e3 / total:.0f} crops/s/chip")
    if "--small" not in sys.argv:
        tiled_case(rng)


if __name__ == "__main__":
    main()
