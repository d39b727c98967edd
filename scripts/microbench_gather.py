"""Microbenchmark TPU gather/scatter/matmul primitives (slope protocol).

Which lookup primitive should CLAHE / affine resampling be built on?
  elem_gather   per-element gather: x[idx] with idx (65536,)
  row_gather    row-granular gather: x2d[idx_rows, :] (256 rows of 256)
  row4_gather   (65536, 4) gather fetching 4 contiguous elements per index
  scatter_add   zeros.at[idx].add(v), 65536 scatters into 65536
  onehot_mm     one-hot matmul lookup: onehot(b, 256) @ table (batched 256x)
  cmp_mm        comparison-matrix matmul: (b >= iota) @ pdf
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 65536
H = W = 256


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
        slopes.append((d2 - d1) / n)
    return 1e3 * float(np.median(slopes))


def chain(body):
    @jax.jit
    def run(x, idx, s, n):
        def f(_, carry):
            x, acc = carry
            out = body(x + s, idx)
            return x + s * 1e-9 * out, acc + out
        _, acc = jax.lax.fori_loop(0, n, f, (x, jnp.float32(0)))
        return acc
    return run


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    x2d = x.reshape(H, W)
    idx = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
    idx_rows = jnp.asarray(rng.integers(0, H, H).astype(np.int32))
    bins = jnp.asarray(rng.integers(0, 256, N).astype(np.int32))
    table = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))

    res = {}

    res["elem_gather"] = slope_ms(
        chain(lambda x, i: x[i].sum()), (x, idx), n=20)

    res["row_gather"] = slope_ms(
        chain(lambda x, i: x.reshape(H, W)[i, :].sum()), (x, idx_rows), n=20)

    res["row4_gather"] = slope_ms(
        chain(lambda x, i: x.reshape(N // 4, 4)[i % (N // 4), :].sum()),
        (x, idx), n=20)

    res["scatter_add"] = slope_ms(
        chain(lambda x, i: jnp.zeros(N, jnp.float32).at[i].add(x).sum()),
        (x, idx), n=20)

    # one-hot matmul: 256 blocks x 256 pixels, each block looks up its own
    # 256-entry table (the CLAHE shape)
    def onehot_mm(x, b):
        oh = jax.nn.one_hot(b.reshape(256, 256), 256, dtype=jnp.bfloat16)
        t = (table + x[0]).astype(jnp.bfloat16)  # (256 tables, 256 bins)
        out = jnp.einsum("bpn,bn->bp", oh, t[:, :])
        return out.astype(jnp.float32).sum()
    res["onehot_mm"] = slope_ms(
        chain(lambda x, i: onehot_mm(x, bins)), (x, idx), n=20)

    # 4-table variant (CLAHE bilinear: each block reads 4 neighbor tables)
    def onehot_mm4(x, b):
        oh = jax.nn.one_hot(b.reshape(256, 256), 256, dtype=jnp.bfloat16)
        t = (table + x[0]).astype(jnp.bfloat16)
        t4 = jnp.stack([t, t + 1, t + 2, t + 3], axis=-1)  # (256, 256, 4)
        out = jnp.einsum("bpn,bn4->bp4", oh, t4)
        return out.astype(jnp.float32).sum()
    res["onehot_mm4"] = slope_ms(
        chain(lambda x, i: onehot_mm4(x, bins)), (x, idx), n=20)

    for k, v in res.items():
        print(f"{k:12s} {v:8.3f} ms per 64K-element op")


if __name__ == "__main__":
    main()
