"""Measure the compute cost of test-time augmentation (InferConfig.tta).

Times the engine's traced forward (`InferenceEngine._net_apply`) with and
without TTA on the flagship DUNet at 256^2 batch 16, using bench.py's slope
protocol: iterations chained inside ONE jit with a data dependence, scalar
fetched, per-crop ms = the (n, 2n) runtime slope.  Naive host-side timing
is unusable here (~25 ms tunnel round-trip per call, async result caching,
and 2x day-to-day host speed variance swamp the 1-10 ms/crop signal).

Usage:  python scripts/bench_tta.py   (~3 min incl. compiles on the chip)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

BATCH, SIZE = 16, 256


def _slope_ms(run, args, n, trials=3):
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


def main():
    from microbeseg_tpu.config import InferConfig, ModelConfig
    from microbeseg_tpu.inference.engine import InferenceEngine
    from microbeseg_tpu.models.io import variables_template
    from microbeseg_tpu.models.unet import build_unet

    model = build_unet(ModelConfig())  # flagship DUNet, bf16 compute
    rng = np.random.default_rng(0)
    shapes = variables_template(model, (SIZE, SIZE), ch_in=1)
    variables = jax.tree.map(
        lambda s: jnp.asarray((rng.standard_normal(s.shape) * 0.05)
                              .astype(s.dtype)), shapes)
    x = jnp.asarray(rng.standard_normal((BATCH, SIZE, SIZE, 1))
                    .astype(np.float32))

    rows = {}
    for tta in (False, True):
        eng = InferenceEngine(model, {}, "distance",
                              cfg=InferConfig(tta=tta))

        @jax.jit
        def chain(variables, x, s, n, eng=eng):
            def body(_, carry):
                x, acc = carry
                border, cell = eng._net_apply((variables,), x)
                # acc consumes BOTH heads or XLA dead-code-eliminates the
                # unused decoder and under-reports the forward cost
                return (x + s * cell[..., None],
                        acc + cell[0, 0, 0] + border[0, 0, 0])
            _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return acc

        rows[tta] = _slope_ms(lambda v, xx, s, n: chain(v, xx, s, n),
                              (variables, x), n=4 if tta else 10)
        print(f"tta={tta}: {rows[tta]:.3f} ms/crop forward at {SIZE}^2 "
              f"batch {BATCH}", flush=True)
    print(f"TTA forward cost factor: {rows[True] / rows[False]:.2f}x "
          f"(8 dihedral variants at the square {SIZE}^2 bucket)")


if __name__ == "__main__":
    main()
