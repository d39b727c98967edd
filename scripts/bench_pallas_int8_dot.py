"""Go/no-go probe for a Pallas fused int8 conv: does Mosaic emit the
v5e double-rate int8 MXU path for an int8xint8->int32 dot inside a Pallas
kernel, and what does a bf16 Pallas matmul do vs XLA's?

Times three matmul variants at (M, K) x (K, N) with M=N=K=2048:
  xla-bf16     jnp.dot bf16 (the baseline the conv rewrite must beat)
  pallas-bf16  tiled Pallas matmul, bf16 in / f32 accum
  pallas-int8  tiled Pallas matmul, int8 in / int32 accum

Decision rule (docs/E2E_RESULTS.md int8 probe): proceed with the fused
int8 conv kernel only if pallas-int8 >= 1.5x xla-bf16.

Usage: python scripts/bench_pallas_int8_dot.py [M [K [N]]]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def matmul_kernel(a_ref, b_ref, o_ref, acc_ref, *, k_steps, out_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_ref.dtype)

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def make_matmul(M, K, N, in_dtype, acc_dtype, out_dtype,
                bm=512, bk=512, bn=512):
    bm, bk, bn = min(bm, M), min(bk, K), min(bn, N)
    grid = (M // bm, N // bn, K // bk)

    kernel = pl.pallas_call(
        functools.partial(matmul_kernel, k_steps=grid[2], out_dtype=out_dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                  pl.BlockSpec((bk, bn), lambda i, j, k: (k, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
    )
    return kernel


def slope_ms(chain, n=48, trials=3):
    float(chain(0, n)); float(chain(0, 2 * n))
    slopes = []
    for t in range(trials):
        t0 = time.perf_counter(); float(chain(t + 1, n)); d1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(chain(t + 1, 2 * n)); d2 = time.perf_counter() - t0
        slopes.append((d2 - d1) / n)
    return 1e3 * float(np.median(slopes))


def bench(M, K, N):
    rng = np.random.default_rng(0)
    flops = 2.0 * M * K * N

    def report(name, ms):
        print(f"{name:12s} {ms:8.3f} ms   {flops / ms / 1e9:8.1f} TFLOP/s",
              flush=True)

    # --- xla bf16
    a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)

    # every chain perturbs the matmul INPUT with the accumulator so the
    # dot cannot be hoisted out of the fori_loop (and the axon runtime
    # cannot memoize the call) — same protocol as bench.py
    @jax.jit
    def xla_chain(s, n):
        def body(_, acc):
            y = jnp.dot(a + (s + acc) * 1e-9, b,
                        preferred_element_type=jnp.float32)
            # sum(y*y): sum(dot(A,B)) alone factors into colsum*rowsum
            return acc + jnp.sum(y * y) * 1e-15
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    report("xla-bf16", slope_ms(xla_chain))

    # --- pallas bf16
    mm_bf16 = make_matmul(M, K, N, jnp.bfloat16, jnp.float32, jnp.bfloat16)

    @jax.jit
    def pl_bf16_chain(s, n):
        def body(_, acc):
            y = mm_bf16((a + (s + acc) * 1e-9).astype(jnp.bfloat16), b)
            yf = y.astype(jnp.float32)
            return acc + jnp.sum(yf * yf) * 1e-15
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    report("pallas-bf16", slope_ms(pl_bf16_chain))

    # --- pallas int8
    ai = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    bi = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    mm_int8 = make_matmul(M, K, N, jnp.int8, jnp.int32, jnp.int32)

    @jax.jit
    def pl_int8_chain(s, n):
        def body(_, acc):
            y = mm_int8(ai + ((s + acc) % 2).astype(jnp.int8), bi)
            return acc + (jnp.sum(y) % 1024)
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    report("pallas-int8", slope_ms(pl_int8_chain))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    M = args[0] if args else 2048
    K = args[1] if len(args) > 1 else M
    N = args[2] if len(args) > 2 else K
    bench(M, K, N)
