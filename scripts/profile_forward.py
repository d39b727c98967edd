"""Forward-only (eval-mode) cost attribution for the flagship DUNet.

Companion to profile_overhead.py (train fwd+bwd): slope-times
model.apply(train=False) at 256^2 batch 16 for component-stripped variants,
to locate the non-conv cost of the INFERENCE forward (the headline bench
metric's numerator).

Usage: python scripts/profile_forward.py [keys...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from microbeseg_tpu.models.unet import DUNet  # noqa: E402

SIZE = 256
BATCH = 16

VARIANTS = {
    "base":      dict(act_fun="relu", normalization="bn"),   # bench flagship
    "mish_bn":   dict(act_fun="mish", normalization="bn"),
    "mish_gn":   dict(act_fun="mish", normalization="gn"),
    "relu_gn":   dict(act_fun="relu", normalization="gn"),
    "bare":      dict(act_fun="linear", normalization="none"),
    "bare_max":  dict(act_fun="linear", normalization="none",
                      pool_method="max"),
}


def fwd_ms(model, rng):
    images = jnp.asarray(
        rng.standard_normal((BATCH, SIZE, SIZE, 1)).astype(np.float32))
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images[:1], train=False))
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            (rng.standard_normal(s.shape) * 0.05).astype(s.dtype)), shapes)

    @jax.jit
    def chain(variables, x, s, n):
        def body(_, carry):
            acc = carry
            border, cell = model.apply(variables, x + s * acc * 1e-9,
                                       train=False)
            # consume BOTH heads or XLA dead-code-eliminates decoder1
            return acc + (jnp.sum(cell) + jnp.sum(border)) * 1e-9

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    def run(s, n):
        return chain(variables, images, s, n)

    float(run(1e-9, 4)); float(run(1e-9, 8))
    slopes = []
    for t in range(3):
        s = 1e-8 * (t + 1)
        t0 = time.perf_counter(); float(run(s, 4)); d1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(run(s, 8)); d2 = time.perf_counter() - t0
        slopes.append((d2 - d1) / (4 * BATCH))
    return 1e3 * float(np.median(slopes))


def main():
    keys = [k for k in sys.argv[1:] if k in VARIANTS] or list(VARIANTS)
    rng = np.random.default_rng(0)
    for key in keys:
        model = DUNet(**VARIANTS[key])
        ms = fwd_ms(model, rng)
        print(f"{key:9s} {VARIANTS[key]}: fwd {ms:.3f} ms/crop "
              f"({1e3 / ms:.0f} crops/s)", flush=True)


if __name__ == "__main__":
    main()
