"""Break down post-processing cost on the real TPU chip (slope protocol).

Stages (batch 8, 256^2 distance-field-like inputs):
  full        distance_postprocessing (gaussian -> seeds -> CC -> prune ->
              flood), method='flood'
  pallas      same with method='pallas' (in-VMEM flood kernel)
  cc          connected_components on the seed mask
  seq         sequentialize_components (rank flooding)
  prune       _prune_small_seeds one-hot matmuls (incl. CC + seq)
  flood       XLA quantized-level watershed alone
  floodp      Pallas in-VMEM flood alone
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

SIZE = 256
BATCH = 8


def slope_ms(run, args, n, trials=3):
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
        slopes.append((d2 - d1) / (n * BATCH))
    return 1e3 * float(np.median(slopes))


def chain(body):
    @jax.jit
    def run(c, b, s, n):
        def f(_, carry):
            c, acc = carry
            out = body(c + s, b)
            return c + s * 1e-9 * out, acc + out
        _, acc = jax.lax.fori_loop(0, n, f, (c, jnp.float32(0)))
        return acc
    return run


def main(stages):
    from microbeseg_tpu.ops.cc import (connected_components,
                                       sequentialize_components)
    from microbeseg_tpu.ops.postprocessing import (_prune_small_seeds,
                                                   distance_postprocessing)
    from microbeseg_tpu.ops.watershed import watershed

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    cells_np = np.zeros((BATCH, SIZE, SIZE), np.float32)
    for i in range(BATCH):
        cell = np.zeros((SIZE, SIZE), np.float32)
        for _ in range(24):
            cy, cx = rng.integers(10, SIZE - 10, 2)
            r = rng.integers(6, 14)
            d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
            cell = np.maximum(cell, np.clip(1 - d / r, 0, 1))
        cells_np[i] = cell
    borders_np = np.clip(cells_np - np.roll(cells_np, 3, axis=1), 0, 0.3)
    cells = jnp.asarray(cells_np)
    borders = jnp.asarray(borders_np)
    seeds_bin = (cells - borders) > 0.45
    masks = cells > 0.10
    seed_cc = jax.vmap(connected_components)(seeds_bin)
    seeds = jax.vmap(lambda b: _prune_small_seeds(b, 4.0, 0.10))(seeds_bin)

    res = {}
    if "full" in stages:
        res["full"] = slope_ms(chain(lambda c, b: jax.vmap(
            lambda bb, cc: distance_postprocessing(bb, cc, 0.45, 0.10))(
                b, c).astype(jnp.float32).sum()), (cells, borders), n=25)
    if "pallas" in stages:
        res["pallas"] = slope_ms(chain(lambda c, b: jax.vmap(
            lambda bb, cc: distance_postprocessing(
                bb, cc, 0.45, 0.10, method="pallas"))(
                b, c).astype(jnp.float32).sum()), (cells, borders), n=25)
    if "cc" in stages:
        res["cc"] = slope_ms(chain(lambda c, b: jax.vmap(
            connected_components)((c - b) > 0.45).astype(jnp.float32).sum()),
            (cells, borders), n=25)
    if "seq" in stages:
        res["seq"] = slope_ms(chain(lambda c, b: jax.vmap(
            sequentialize_components)(
                (seed_cc + (c[..., :1, :1] * 0).astype(jnp.int32))
            ).astype(jnp.float32).sum()), (cells, borders), n=25)
    if "prune" in stages:
        res["prune"] = slope_ms(chain(lambda c, b: jax.vmap(
            lambda sb: _prune_small_seeds(sb, 4.0, 0.10))(
                (c - b) > 0.45).astype(jnp.float32).sum()),
            (cells, borders), n=25)
    if "flood" in stages:
        res["flood"] = slope_ms(chain(lambda c, b: jax.vmap(
            lambda cc, ss, mm: watershed(-cc, ss, mm))(
                c, seeds, masks).astype(jnp.float32).sum()),
            (cells, borders), n=25)
    if "floodp" in stages:
        from microbeseg_tpu.ops.pallas.flood import flood_pallas
        res["floodp"] = slope_ms(chain(lambda c, b: flood_pallas(
            -c, seeds, masks).astype(jnp.float32).sum()),
            (cells, borders), n=25)

    for k, v in res.items():
        print(f"{k:8s} {v:8.3f} ms/crop")


if __name__ == "__main__":
    main(sys.argv[1:] or ["full", "cc", "seq", "prune", "flood", "floodp"])
