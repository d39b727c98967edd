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

Large-frame mode: `--size 2048 --batch 1 --cap 16384 --n 4` reproduces the
engine's full-frame post-processing configuration (area-scaled seed cap,
engine._seeds_cap) to locate the at-scale bottleneck.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

SIZE = 256
BATCH = 8
CAP = 256
N = 25


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
    # cell density matches the 256^2 default (24 cells / 256^2 px); window-
    # local placement keeps big-frame synthesis fast on the 1-core host
    n_cells = max(1, round(24 * (SIZE * SIZE) / (256 * 256)))
    cells_np = np.zeros((BATCH, SIZE, SIZE), np.float32)
    for i in range(BATCH):
        cell = np.zeros((SIZE, SIZE), np.float32)
        for _ in range(n_cells):
            cy, cx = rng.integers(10, SIZE - 10, 2)
            r = int(rng.integers(6, 14))
            w = 2 * r + 1
            ys, xs = np.ogrid[-r:r + 1, -r:r + 1]
            d = np.sqrt(ys ** 2 + xs ** 2)
            y0, x0 = cy - r, cx - r
            y1, x1 = min(y0 + w, SIZE), min(x0 + w, SIZE)
            cy0, cx0 = max(y0, 0), max(x0, 0)
            win = np.clip(1 - d / r, 0, 1)[cy0 - y0:y1 - y0, cx0 - x0:x1 - x0]
            cell[cy0:y1, cx0:x1] = np.maximum(cell[cy0:y1, cx0:x1], win)
        cells_np[i] = cell
    borders_np = np.clip(cells_np - np.roll(cells_np, 3, axis=1), 0, 0.3)
    cells = jnp.asarray(cells_np)
    borders = jnp.asarray(borders_np)
    seeds_bin = (cells - borders) > 0.45
    masks = cells > 0.10
    seed_cc = jax.vmap(connected_components)(seeds_bin)
    seeds = jax.vmap(lambda b: _prune_small_seeds(
        b, 4.0, 0.10, max_seeds=CAP))(seeds_bin)

    res = {}
    if "full" in stages:
        res["full"] = slope_ms(chain(lambda c, b: jax.vmap(
            lambda bb, cc: distance_postprocessing(
                bb, cc, 0.45, 0.10, max_seeds=CAP))(
                b, c).astype(jnp.float32).sum()), (cells, borders), n=N)
    if "pallas" in stages:
        res["pallas"] = slope_ms(chain(lambda c, b: jax.vmap(
            lambda bb, cc: distance_postprocessing(
                bb, cc, 0.45, 0.10, max_seeds=CAP, method="pallas"))(
                b, c).astype(jnp.float32).sum()), (cells, borders), n=N)
    if "cc" in stages:
        res["cc"] = slope_ms(chain(lambda c, b: jax.vmap(
            connected_components)((c - b) > 0.45).astype(jnp.float32).sum()),
            (cells, borders), n=N)
    if "seq" in stages:
        res["seq"] = slope_ms(chain(lambda c, b: jax.vmap(
            sequentialize_components)(
                (seed_cc + (c[..., :1, :1] * 0).astype(jnp.int32))
            ).astype(jnp.float32).sum()), (cells, borders), n=N)
    if "prune" in stages:
        res["prune"] = slope_ms(chain(lambda c, b: jax.vmap(
            lambda sb: _prune_small_seeds(sb, 4.0, 0.10, max_seeds=CAP))(
                (c - b) > 0.45).astype(jnp.float32).sum()),
            (cells, borders), n=N)
    if "flood" in stages:
        res["flood"] = slope_ms(chain(lambda c, b: jax.vmap(
            lambda cc, ss, mm: watershed(-cc, ss, mm))(
                c, seeds, masks).astype(jnp.float32).sum()),
            (cells, borders), n=N)
    if "floodp" in stages:
        from microbeseg_tpu.ops.pallas.flood import flood_pallas
        res["floodp"] = slope_ms(chain(lambda c, b: flood_pallas(
            -c, seeds, masks).astype(jnp.float32).sum()),
            (cells, borders), n=N)
    if "floodt" in stages:
        from microbeseg_tpu.ops.pallas.flood import flood_tiled
        res["floodt"] = slope_ms(chain(lambda c, b: jax.vmap(
            lambda cc, ss, mm: flood_tiled(-cc, ss, mm))(
                c, seeds, masks).astype(jnp.float32).sum()),
            (cells, borders), n=N)

    for k, v in res.items():
        print(f"{k:8s} {v:8.3f} ms/crop")


if __name__ == "__main__":
    args = sys.argv[1:]
    stages = []
    i = 0
    while i < len(args):
        a = args[i]
        if a in ("--size", "--batch", "--cap", "--n"):
            val = int(args[i + 1])
            if a == "--size":
                SIZE = val
            elif a == "--batch":
                BATCH = val
            elif a == "--cap":
                CAP = val
            else:
                N = val
            i += 2
        else:
            stages.append(a)
            i += 1
    if not stages:
        stages = ["full", "cc", "seq", "prune", "flood"]
        # floodp stages the whole frame as ONE VMEM block and packs labels
        # in 12 bits — only valid at crop-class sizes/caps; large frames
        # use floodt (the tiled kernel) instead
        stages += ["floodp"] if SIZE <= 768 and CAP <= 4095 else ["floodt"]
    main(stages)
