"""Does a hand-written conv backward beat XLA's conv-grad kernels on TPU?

For each (H, C_in, C_out) conv layer shape of the flagship DUNet, slope-time
value_and_grad of  sum(conv(x, w))  two ways:

  xla:    plain lax.conv_general_dilated — XLA emits its own
          data-grad (transposed conv) and filter-grad (correlation) kernels
  manual: custom_vjp — data-grad as a regular 3x3 conv with the
          spatially-flipped, io-transposed kernel; filter-grad as 9 per-tap
          einsums 'bhwc,bhwf->cf' over a shifted padded input (clean MXU
          matmuls with K = B*H*W)

Usage: python scripts/bench_conv_bwd.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 16


def conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def conv3x3_manual(x, w):
    return conv3x3(x, w)


def _fwd(x, w):
    return conv3x3(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    g = g.astype(jnp.bfloat16)
    # data grad: correlate g with the flipped kernel, in/out channels swapped
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = conv3x3(g, w_flip).astype(x.dtype)
    # filter grad: per-tap contraction over batch+space = 9 matmuls
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    H, W = x.shape[1], x.shape[2]
    taps = []
    for ky in range(3):
        for kx in range(3):
            xs = jax.lax.slice(xp, (0, ky, kx, 0),
                               (xp.shape[0], ky + H, kx + W, xp.shape[3]))
            taps.append(jnp.einsum("bhwc,bhwf->cf", xs, g,
                                   preferred_element_type=jnp.float32))
    dw = jnp.stack(taps).reshape(3, 3, x.shape[3], g.shape[3])
    return dx, dw.astype(w.dtype)


conv3x3_manual.defvjp(_fwd, _bwd)


def slope_ms(run, n=8, trials=3):
    float(run(1e-9, n))
    float(run(1e-9, 2 * n))
    slopes = []
    for t in range(trials):
        s = 1e-8 * (t + 1)
        t0 = time.perf_counter()
        float(run(s, n))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(s, 2 * n))
        d2 = time.perf_counter() - t0
        slopes.append((d2 - d1) / n)
    return 1e3 * float(np.median(slopes))


def bench(conv_fn, H, ci, co, rng):
    x0 = jnp.asarray(rng.standard_normal((BATCH, H, H, ci)),
                     jnp.bfloat16)
    w0 = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05,
                     jnp.bfloat16)

    @jax.jit
    def chain(x0, w0, s, n):
        def body(_, carry):
            w, acc = carry

            def loss(w):
                # 0.5*sum(y^2): cotangent = y itself — dense and
                # data-dependent, so XLA cannot degenerate dgrad/wgrad into
                # reductions (sum(y) would make the cotangent all-ones)
                x = (x0 + s * acc * 1e-9).astype(jnp.bfloat16)
                y = conv_fn(x, w).astype(jnp.float32)
                return 0.5 * jnp.sum(y * y)

            l, gw = jax.value_and_grad(loss)(w)
            return w - 1e-12 * gw.astype(w.dtype), acc + l

        _, acc = jax.lax.fori_loop(0, n, body, (w0, jnp.float32(0)))
        return acc

    return slope_ms(lambda s, n: chain(x0, w0, s, n))


SHAPES = [  # (H, ci, co, count_in_model) flagship DUNet conv3x3 layers
    (256, 64, 64, 1 + 2 * 1),   # enc0 conv1 + dec3 conv1 x2 decoders
    (256, 128, 64, 2),          # dec3 conv0 (concat 64+64=128 in)
    (256, 1, 64, 1),            # enc0 conv0
    (128, 64, 128, 1),
    (128, 128, 128, 1 + 2),
    (128, 256, 128, 2),
    (64, 128, 256, 1),
    (64, 256, 256, 1 + 2),
    (64, 512, 256, 2),
    (32, 256, 512, 1),
    (32, 512, 512, 1 + 2),
    (32, 1024, 512, 2),
    (16, 512, 1024, 1),
    (16, 1024, 1024, 1),
]


def main():
    import sys
    xla_only = "--xla-only" in sys.argv
    idx = [int(a) for a in sys.argv[1:] if a.isdigit()]
    shapes = [SHAPES[i] for i in idx] if idx else SHAPES
    impls = [("xla", conv3x3)] if xla_only else [
        ("xla", conv3x3), ("manual", conv3x3_manual)]
    rng = np.random.default_rng(0)
    tot = {"xla": 0.0, "manual": 0.0}
    print(f"{'shape':>22s} {'xla ms':>8s} {'manual ms':>9s} {'speedup':>8s}")
    for H, ci, co, cnt in shapes:
        r = {}
        for name, fn in impls:
            r[name] = bench(fn, H, ci, co, rng)
            tot[name] += cnt * r[name]
        man = f"{r['manual']:9.3f} {r['xla'] / r['manual']:8.2f}" \
            if "manual" in r else ""
        print(f"{H:4d}^2 {ci:4d}->{co:4d} x{cnt}: {r['xla']:8.3f} {man}",
              flush=True)
    print(f"\nmodel-weighted totals: xla {tot['xla']:.2f} ms"
          + (f"  manual {tot['manual']:.2f} ms  "
             f"speedup {tot['xla'] / tot['manual']:.2f}x"
             if not xla_only else ""))


if __name__ == "__main__":
    main()
