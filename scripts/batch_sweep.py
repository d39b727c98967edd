"""Inference batch-size sweep at 256^2: is batch 16 leaving MXU time on the
table?

Times the flagship DUNet eval-mode forward and the fused watershed
post-processing per crop (bench.py slope protocol: chained fori_loop with a
data dependence, (n, 2n) runtime slope) across device batch sizes.  The
engine default (InferConfig.batch_size) and bench.py's BATCH should sit at
the measured knee.

Run: JAX_PLATFORMS=axon python scripts/batch_sweep.py [batches...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

SIZE = 256


def _slope_ms(run, args, n, batch, trials=3):
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


def main():
    from bench import _blob_predictions, _random_variables

    from microbeseg_tpu.config import ModelConfig
    from microbeseg_tpu.models.unet import build_unet
    from microbeseg_tpu.ops.postprocessing import distance_postprocessing

    batches = [int(b) for b in sys.argv[1:]] or [8, 16, 32, 64]
    rng = np.random.default_rng(0)
    model = build_unet(ModelConfig())
    variables = None

    for batch in batches:
        images = jnp.asarray(
            rng.standard_normal((batch, SIZE, SIZE, 1)).astype(np.float32))
        if variables is None:
            variables = _random_variables(model, images)

        @jax.jit
        def fwd_chain(variables, x, s, n):
            def body(_, carry):
                x, acc = carry
                border, cell = model.apply(variables, x, train=False)
                return (x + s * cell,
                        acc + border[0, 0, 0, 0] + cell[0, 0, 0, 0])
            _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return acc

        fwd_ms = _slope_ms(lambda v, x, s, n: fwd_chain(v, x, s, n),
                           (variables, images), n=10, batch=batch)

        borders_np, cells_np = _blob_predictions(rng, batch)
        borders, cells = jnp.asarray(borders_np), jnp.asarray(cells_np)

        @jax.jit
        def post_chain(cells, borders, s, n):
            def body(_, carry):
                c, acc = carry
                masks = jax.vmap(lambda b, cc: distance_postprocessing(
                    b, cc, 0.45, 0.10))(borders, c)
                return c + s, acc + masks.astype(jnp.float32).sum()
            _, acc = jax.lax.fori_loop(0, n, body, (cells, jnp.float32(0)))
            return acc

        post_ms = _slope_ms(lambda c, b, s, n: post_chain(c, b, s, n),
                            (cells, borders), n=25, batch=batch)
        total = fwd_ms + post_ms
        print(f"batch {batch:3d}: fwd {fwd_ms:.3f} + post {post_ms:.3f} "
              f"= {total:.3f} ms/crop ({1e3 / total:.0f} crops/s)",
              flush=True)


if __name__ == "__main__":
    main()
