"""On-chip exactness probe for the radix matmul reductions (ops/radix.py).

Run on the REAL TPU backend: XLA's default TPU matmul precision truncates
f32 operands to bf16, which silently collided remap ids above 256 (257 ->
256, 259/261 -> 260 ...) and quantized coordinate weights by ~0.4% until
every radix einsum was pinned to precision="highest" (2026-08-19).  CPU
runs are true f32 and CANNOT catch a regression here — this probe must be
re-run on the chip whenever radix.py or XLA/libtpu versions change.

  python scripts/probe_radix_exactness.py     # prints PASS/FAIL per check
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax
    import jax.numpy as jnp

    import microbeseg_tpu.ops.postprocessing as pp
    from microbeseg_tpu.ops.radix import (radix_central_moments,
                                          radix_histogram, radix_lookup)

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    failures = 0

    # 1) integer table lookup at cap 4096 (the collided case)
    cap = 4096
    ids = jnp.asarray(rng.integers(0, cap + 1, 1 << 18).astype(np.int32))
    table = jnp.asarray(np.arange(cap + 1, dtype=np.float32))
    got = np.asarray(radix_lookup(ids, table)).astype(np.int64)
    ok = np.array_equal(got, np.asarray(ids))
    failures += not ok
    print("lookup exact (cap 4096):", "PASS" if ok else
          f"FAIL max err {np.abs(got - np.asarray(ids)).max()}")

    # 2) prune remap end-to-end with ~800 surviving components
    H = W = 512
    rank = np.zeros((H, W), np.int32)
    for k in range(1, 801):
        cy, cx = rng.integers(4, H - 4, 2)
        r = int(rng.integers(1, 4))
        rank[cy - r:cy + r + 1, cx - r:cx + r + 1] = k
    u = np.unique(rank)
    remap = np.zeros(u.max() + 1, np.int64)
    remap[u] = np.arange(len(u))
    rank = remap[rank].astype(np.int32)
    out = np.asarray(pp._prune_radix(jnp.asarray(rank), cap, 4.0, 0.10))
    areas = np.bincount(rank.reshape(-1), minlength=cap + 1).astype(float)
    areas[0] = 0
    n = (areas > 0).sum()
    mn = max(0.10 * areas.sum() / max(n, 1), 4.0)
    kept = areas > mn
    ref = (np.cumsum(kept.astype(np.int64)) * kept)[rank]
    ok = np.array_equal(out, ref)
    failures += not ok
    print("prune remap exact (800 ids):", "PASS" if ok else "FAIL")

    # 3) weighted histogram with full-frame coordinates (bf16 would lose
    #    ~0.4% of the yy/xx weights)
    S = 2048
    flat = jnp.asarray(rng.integers(0, 1025, S * 8).astype(np.int32))
    yy = jnp.asarray(np.tile(np.arange(S, dtype=np.float32), 8))
    (sy,) = radix_histogram(flat, 1024, (yy,))
    ref_sy = np.bincount(np.asarray(flat), weights=np.asarray(yy),
                         minlength=1025)
    err = np.abs(np.asarray(sy) - ref_sy).max()
    ok = err < 1e-2
    failures += not ok
    print(f"weighted histogram (coords): {'PASS' if ok else 'FAIL'} "
          f"max err {err:.2e}")

    # 4) fused central moments vs a numpy two-pass
    ids2 = np.asarray(flat)
    xx = np.asarray(yy)[::-1].copy()
    cy_tab = np.zeros(1025, np.float32)
    counts = np.bincount(ids2, minlength=1025)
    cy_tab[counts > 0] = (np.bincount(ids2, weights=np.asarray(yy),
                                      minlength=1025)[counts > 0]
                          / counts[counts > 0])
    cx_tab = np.zeros(1025, np.float32)
    cx_tab[counts > 0] = (np.bincount(ids2, weights=xx,
                                      minlength=1025)[counts > 0]
                          / counts[counts > 0])
    mu20, mu02, mu11 = radix_central_moments(
        jnp.asarray(ids2), 1024, jnp.asarray(np.asarray(yy)),
        jnp.asarray(xx), jnp.asarray(cy_tab), jnp.asarray(cx_tab))
    dy = np.asarray(yy) - cy_tab[ids2]
    dx = xx - cx_tab[ids2]
    ref20 = np.bincount(ids2, weights=dy * dy, minlength=1025)
    scale = max(ref20.max(), 1.0)
    err = np.abs(np.asarray(mu20)[:1024] - ref20[:1024]).max() / scale
    # relative: sums reach ~1e7, where f32 accumulation ulp is ~1; a bf16
    # truncation regression would show up at ~4e-3 relative
    ok = err < 1e-5
    failures += not ok
    print(f"central moments: {'PASS' if ok else 'FAIL'} "
          f"max rel err {err:.2e}")

    print("ALL PASS" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
