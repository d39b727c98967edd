"""int8-inference quality + speed check on a real trained model.

Loads the _scale_out distance model (DU/mish/gn 16->128, trained on the
round-3 scale corpus), segments its 24-image 256^2 test set with the bf16
and the int8 (InferConfig.quantize) engines at the model's best thresholds,
and reports AJI+ for both, plus slope-timed forward ms/crop on the flagship
(random-weight) DUNet for the perf delta.

Usage: python scripts/eval_quant.py [--no-perf] [--model STEM]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")

MODEL = Path("/root/repo/_scale_out/models/trainset256/distance_model_01")
TEST = Path("/root/repo/_scale_out/training_dataset/trainset256/test")
TH_CELL, TH_SEED = 0.05, 0.45


def quality():
    from microbeseg_tpu.config import InferConfig
    from microbeseg_tpu.evaluation.metrics import get_fast_aji_plus
    from microbeseg_tpu.inference.engine import InferenceEngine
    from microbeseg_tpu.utils.image import border_correction

    from microbeseg_tpu.utils import imread

    imgs = sorted(TEST.glob("img_*.tif"))
    frames = np.stack([imread(p) for p in imgs])
    truths = [imread(TEST / p.name.replace("img", "mask")) for p in imgs]
    out = {}
    for mode in ("bf16", "int8"):
        cfg = InferConfig(th_cell=TH_CELL, th_seed=TH_SEED,
                          quantize=(mode == "int8"))
        engine = InferenceEngine.from_checkpoint(MODEL, cfg=cfg)
        masks = engine.segment(frames)
        scores = []
        for truth, pred in zip(truths, masks):
            t = border_correction(truth)
            p = border_correction(pred)
            scores.append(get_fast_aji_plus(t, p))
        out[mode] = (float(np.mean(scores)), float(np.std(scores)))
        print(f"{mode}: AJI+ {out[mode][0]:.4f} +/- {out[mode][1]:.4f}",
              flush=True)
    return out


def perf(size=256, batch=16):
    import time

    import jax
    import jax.numpy as jnp

    from microbeseg_tpu.config import ModelConfig
    from microbeseg_tpu.models.unet import build_unet

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((batch, size, size, 1)).astype(np.float32))
    for mode in ("bf16", "int8-dyn", "int8-static"):
        model = build_unet(ModelConfig(), quantize=mode.startswith("int8"))
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), x[:1], train=False))
        variables = jax.tree.map(
            lambda s: jnp.asarray(
                (rng.standard_normal(s.shape) * 0.05).astype(s.dtype)),
            shapes)
        if mode == "int8-static":
            # one calibration pass -> static per-layer activation scales
            _, upd = jax.jit(lambda v, xx: model.apply(
                v, xx, train=False, mutable=["quant"]))(variables, x[:4])
            variables = {**variables, **jax.device_get(upd)}

        @jax.jit
        def chain(variables, x, s, n):
            def body(_, acc):
                border, cell = model.apply(variables, x + s * acc * 1e-9,
                                           train=False)
                return acc + (jnp.sum(cell) + jnp.sum(border)) * 1e-9
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        def run(s, n):
            return chain(variables, x, s, n)

        float(run(1e-9, 4)); float(run(1e-9, 8))
        slopes = []
        for t in range(3):
            s = 1e-8 * (t + 1)
            t0 = time.perf_counter(); float(run(s, 4)); d1 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(run(s, 8)); d2 = time.perf_counter() - t0
            slopes.append((d2 - d1) / (4 * batch))
        ms = 1e3 * float(np.median(slopes))
        print(f"{mode}: flagship fwd {size}^2 b{batch} {ms:.3f} ms/frame "
              f"({1e3/ms:.0f} frames/s)", flush=True)


if __name__ == "__main__":
    if "--perf-only" not in sys.argv:
        quality()
    if "--no-perf" not in sys.argv:
        if "--large" in sys.argv:
            perf(1024, 2)
        else:
            perf()
