"""Probe: does int8 buy conv throughput on this chip (v5e: 394 int8 vs
197 bf16 TOPS)?  Slope-times a 3x3 conv fwd at flagship shapes in bf16 vs
int8 (int8 inputs/weights, int32 accumulate, rescale to bf16).

Usage: python scripts/bench_int8_conv.py [shape indices]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 16

SHAPES = [
    (256, 64, 64),
    (256, 128, 64),
    (128, 128, 128),
    (64, 256, 256),
    (32, 512, 512),
    (16, 1024, 1024),
]


def conv(x, w, out_dtype):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype)


def slope_ms(run, n=8, trials=3):
    float(run(0, n)); float(run(0, 2 * n))
    slopes = []
    for t in range(trials):
        t0 = time.perf_counter(); float(run(t + 1, n)); d1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(run(t + 1, 2 * n)); d2 = time.perf_counter() - t0
        slopes.append((d2 - d1) / n)
    return 1e3 * float(np.median(slopes))


def bench(H, ci, co, dtype, rng):
    if dtype == "bf16":
        x0 = jnp.asarray(rng.standard_normal((BATCH, H, H, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05,
                        jnp.bfloat16)

        @jax.jit
        def chain(x0, w, s, n):
            def body(_, acc):
                y = conv(x0 + acc.astype(jnp.bfloat16) * 1e-12, w,
                         jnp.bfloat16)
                return acc + jnp.sum(y.astype(jnp.float32)) * 1e-9
            return jax.lax.fori_loop(0, n, body, jnp.float32(s))
    else:
        x0 = jnp.asarray(rng.integers(-127, 127, (BATCH, H, H, ci)), jnp.int8)
        w = jnp.asarray(rng.integers(-127, 127, (3, 3, ci, co)), jnp.int8)

        @jax.jit
        def chain(x0, w, s, n):
            def body(_, acc):
                # data dependence through an int8 perturbation of x
                xi = (x0 + (acc % 2).astype(jnp.int8))
                y = conv(xi, w, jnp.int32)
                return acc + (jnp.sum(y) % 1024)
            return jax.lax.fori_loop(0, n, body, jnp.int32(s))

    return slope_ms(lambda s, n: chain(x0, w, s, n))


def main():
    idx = [int(a) for a in sys.argv[1:]] or range(len(SHAPES))
    rng = np.random.default_rng(0)
    for i in idx:
        H, ci, co = SHAPES[i]
        b = bench(H, ci, co, "bf16", rng)
        q = bench(H, ci, co, "int8", rng)
        print(f"{H:4d}^2 {ci:4d}->{co:4d}: bf16 {b:7.3f} ms  "
              f"int8 {q:7.3f} ms  speedup {b / q:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
