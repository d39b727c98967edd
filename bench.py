"""Benchmark: 256^2 crops/sec/chip through the FULL inference pipeline.

Measures the end-to-end hot path on the real TPU chip: bfloat16 flagship
DUNet (64 -> 1024 filters) forward pass + fused on-device post-processing
(gaussian -> seeds -> connected components -> pruning -> watershed flood) —
the work the reference does per frame at batch 1 with a CPU watershed
(reference: src/inference/infer.py:328-376, src/inference/postprocessing.py:7-59).

Timing methodology (the axon TPU tunnel has ~25 ms per-call round-trip
latency and caches async results, so naive host-side timing is unusable):
each stage is iterated inside ONE jitted fori_loop (traced trip count, so a
single executable serves all runs) with a data dependence between
iterations, the scalar result is fetched to the host, and the per-crop time
is the slope between an n-iteration and a 2n-iteration run — constant
dispatch/fetch overhead cancels.  The forward stage's runtime is
content-independent; the post-processing stage gets distance-field-like
inputs (its flood/convergence loops are content-dependent).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md).
The denominator is the reference pipeline's per-crop time = ~25 ms GPU
batch-1 DUNet forward (documented estimate; no CUDA GPU here to measure)
+ its CPU watershed post-processing MEASURED on this host via the
golden-tested oracle — the "baseline_basis" field in the output records
both numbers and which is measured vs estimated.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

if "--mesh" in sys.argv:
    # the mesh mode runs on a virtual 8-CPU device mesh, not the TPU chip:
    # force the platform BEFORE jax initializes (the ambient axon plugin
    # would otherwise claim the backend — see tests/conftest.py)
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if "--mesh" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

SIZE = 256
BATCH = 16  # the engine's default device batch (InferConfig.batch_size)

# The reference's GPU batch-1 DUNet forward is not measurable here (no CUDA
# GPU in this environment); ~25 ms/crop on a single modern GPU remains a
# documented estimate.  Its CPU watershed stage IS measured on this host —
# see _baseline_basis().
REFERENCE_GPU_FWD_MS_EST = 25.0


def _torch_fwd_ms():
    """Reference-architecture flagship DUNet batch-1 torch forward on THIS
    host's CPU (torch is installed; architecture golden-matched against flax
    in tests/test_torch_import.py).  This is the fully-measured half of the
    baseline forward: the reference's own inference path is torch batch-1
    (reference infer.py:328-376)."""
    import torch

    from tests.test_torch_import import _TorchDUNet

    with torch.no_grad():
        net = _TorchDUNet(pool="conv", act="relu", kind="bn",
                          filters=(64, 1024)).eval()
        x = torch.randn(1, 1, SIZE, SIZE)
        net(x)  # warm-up (allocator, thread pool)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            net(x)
            times.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(times))


def _baseline_basis(borders_np, cells_np):
    """Measure the reference pipeline's CPU side on THIS host so the speedup
    denominator carries measured anchors (VERDICT r2 item 5, r3 item 4):

    - CPU watershed post-processing: tests/oracles.py::
      distance_postprocessing_oracle, the scipy/numpy re-implementation of
      reference postprocessing.py:7-59, golden-tested for parity — MEASURED.
    - torch batch-1 DUNet forward on this CPU — MEASURED (see _torch_fwd_ms).
    - GPU batch-1 forward: no CUDA GPU exists here, so 25 ms/crop stays a
      documented ESTIMATE (PLoS ONE 2022-era single GPU; batch-1 torch
      inference is launch-overhead-bound, so well above the pure-FLOPs
      floor; the measured CPU forward gives the denominator's upper bound).

    Two ratios result: vs_baseline uses the GPU-estimate basis (labeled as
    such), vs_baseline_cpu_measured is fully measured on this host."""
    from tests.oracles import distance_postprocessing_oracle

    times = []
    for b, c in zip(borders_np[:4], cells_np[:4]):
        t0 = time.perf_counter()
        distance_postprocessing_oracle(np.asarray(b), np.asarray(c),
                                       0.45, 0.10)
        times.append(time.perf_counter() - t0)
    post_ms = 1e3 * float(np.median(times))
    cpu_fwd_ms = _torch_fwd_ms()
    per_crop_ms = REFERENCE_GPU_FWD_MS_EST + post_ms
    return {
        "ref_crops_per_sec": round(1e3 / per_crop_ms, 2),
        "ref_crops_per_sec_cpu_measured": round(
            1e3 / (cpu_fwd_ms + post_ms), 3),
        "gpu_fwd_ms_estimated": REFERENCE_GPU_FWD_MS_EST,
        "cpu_fwd_ms_measured_this_host": round(cpu_fwd_ms, 1),
        "cpu_postproc_ms_measured_this_host": round(post_ms, 2),
        "note": "reference pipeline is sequential batch-1 fwd + CPU "
                "watershed per crop (infer.py:328-376); postproc + torch "
                "CPU fwd measured on this host; GPU fwd is a documented "
                "estimate (no CUDA GPU here)",
    }


def _random_variables(model, images):
    """Host-side random init in the model's variable-tree structure.

    Uses variables_template (eval_shape with ABSTRACT operands): a closed-over
    concrete key/sample makes the tracer constant-fold the entire 46M-param
    init eagerly on device — minutes of per-op dispatch over the tunnel."""
    from microbeseg_tpu.models.io import variables_template
    shapes = variables_template(model, images.shape[1:3],
                                ch_in=images.shape[-1])
    rng = np.random.default_rng(0)

    def mk(s):
        arr = (rng.standard_normal(s.shape) * 0.05).astype(s.dtype)
        return jnp.asarray(arr)

    return jax.tree.map(mk, shapes)


def _blob_predictions(rng, n):
    """Distance-field-like (border, cell) prediction pairs for the postproc
    stage: cones around random centers, touching pairs included."""
    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    cells = np.zeros((n, SIZE, SIZE), np.float32)
    for i in range(n):
        cell = np.zeros((SIZE, SIZE), np.float32)
        for _ in range(24):
            cy, cx = rng.integers(10, SIZE - 10, 2)
            r = rng.integers(6, 14)
            d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
            cell = np.maximum(cell, np.clip(1 - d / r, 0, 1))
        cells[i] = cell
    borders = np.clip(cells - np.roll(cells, 3, axis=1), 0, 0.3)
    return borders, cells


def _slope_ms(run, args, n, trials=3, batch=BATCH):
    """Per-crop ms from the (n, 2n) runtime slope, median over trials."""
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


def _train_slope_ms(model, images):
    """Full train-step throughput (augment + fwd + bwd + Ranger update)."""
    import optax

    from microbeseg_tpu.config import TrainConfig
    from microbeseg_tpu.ops.augment import augment_batch
    from microbeseg_tpu.training.losses import get_loss
    from microbeseg_tpu.training.optimizers import build_optimizer

    cfg = TrainConfig(optimizer="ranger", batch_size=BATCH)
    loss_fn = get_loss(cfg.loss, cfg.label_type)
    per_sample = jax.vmap(loss_fn, in_axes=(0, 0))
    tx, _ = build_optimizer(cfg)
    rng = np.random.default_rng(1)
    raw = jnp.asarray(rng.integers(0, 65535, images.shape).astype(np.float32))
    labels = {
        "border_label": jnp.asarray(
            rng.random(images.shape).astype(np.float32)),
        "cell_label": jnp.asarray(
            rng.random(images.shape).astype(np.float32)),
    }
    variables = _random_variables(model, images)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def train_chain(params, opt_state, key, s, n):
        def step(_, carry):
            params, opt_state, acc = carry
            k = jax.random.fold_in(key, acc.astype(jnp.int32) % 1000)
            aug_img, aug_lab = augment_batch(k, raw + s, labels, "distance")

            def losses(p):
                var = {"params": p}
                if batch_stats:
                    var["batch_stats"] = batch_stats
                    preds, _ = model.apply(var, aug_img, train=True,
                                           mutable=["batch_stats"])
                else:
                    preds = model.apply(var, aug_img, train=True)
                return jnp.mean(per_sample(preds, aug_lab))

            loss, grads = jax.value_and_grad(losses)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, acc + loss

        _, _, acc = jax.lax.fori_loop(
            0, n, step, (params, opt_state, jnp.float32(0)))
        return acc

    return _slope_ms(
        lambda p, o, s, n: train_chain(p, o, jax.random.PRNGKey(0), s, n),
        (params, opt_state), n=5)


def mesh_main():
    """--mesh: data-parallel scaling correctness on the virtual 8-CPU mesh.

    Runs the sharded train step (augment + fwd/bwd, psum grad all-reduce and
    sync-BN reductions inserted by XLA's partitioner) on an 8-device mesh and
    a 1-device mesh with identical batches/keys and asserts loss, gradient,
    and batch-statistic equivalence — the driver-runnable counterpart of
    tests/test_parallel.py.
    """
    import numpy as np

    from microbeseg_tpu.config import ModelConfig, TrainConfig
    from microbeseg_tpu.models.unet import build_unet
    from microbeseg_tpu.ops.augment import augment_batch
    from microbeseg_tpu.parallel.mesh import (batch_sharding, get_mesh,
                                              replicated_sharding)
    from microbeseg_tpu.training.losses import get_batch_loss

    assert len(jax.devices()) == 8, f"expected 8 devices, got {jax.devices()}"
    rng = np.random.default_rng(0)
    size, n = 16, 8
    images = jnp.asarray(
        rng.integers(0, 65535, (n, size, size, 1)).astype(np.float32))
    labels = {
        "border_label": jnp.asarray(
            rng.random((n, size, size, 1)).astype(np.float32)),
        "cell_label": jnp.asarray(
            rng.random((n, size, size, 1)).astype(np.float32))}

    cfg = TrainConfig(model=ModelConfig(filters=(8, 16), act_fun="mish",
                                        normalization="bn"),
                      batch_size=n, compute_dtype="float32")
    model = build_unet(cfg.model, dtype=jnp.float32)
    batch_loss = get_batch_loss(cfg.loss, cfg.label_type)
    variables = model.init(jax.random.PRNGKey(7),
                           jnp.zeros((1, size, size, 1)), train=False)

    def grad_step(params, bs, images, labels, weights, key):
        aug_img, aug_labels = augment_batch(key, images, labels, "distance")

        def losses(p):
            preds, mut = model.apply({"params": p, "batch_stats": bs},
                                     aug_img, train=True,
                                     mutable=["batch_stats"])
            return batch_loss(preds, aug_labels, weights), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            losses, has_aux=True)(params)
        return loss, grads, new_bs

    out = {}
    for n_dev in (1, 8):
        mesh = get_mesh(n_dev)
        bsh, rsh = batch_sharding(mesh), replicated_sharding(mesh)
        step = jax.jit(grad_step, in_shardings=(rsh, rsh, bsh, bsh, bsh, rsh),
                       out_shardings=(rsh, rsh, rsh))
        loss, grads, new_bs = step(
            variables["params"], variables["batch_stats"],
            images, labels, jnp.ones(n), jax.random.PRNGKey(11))
        out[n_dev] = (float(loss), jax.device_get(grads),
                      jax.device_get(new_bs))

    assert np.isclose(out[1][0], out[8][0], rtol=1e-5), \
        f"loss diverged: {out[1][0]} vs {out[8][0]}"
    # atol 1e-5 (same as tests/test_parallel.py, same reason): the
    # interpolation-matrix augmentation makes shard reduction order visible
    # at ~1e-6 magnitude, so a tighter atol flakes across mesh sizes
    max_rel = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(out[1][1]),
                    jax.tree_util.tree_leaves(out[8][1])):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)
        denom = np.maximum(np.abs(a), 1e-6)
        max_rel = max(max_rel, float(np.max(np.abs(a - b) / denom)))
    for a, b in zip(jax.tree_util.tree_leaves(out[1][2]),
                    jax.tree_util.tree_leaves(out[8][2])):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)
    print(json.dumps({
        "metric": "mesh8-vs-mesh1 train-step equivalence "
                  "(loss+grads+sync-BN stats)",
        "value": 1.0, "unit": "pass",
        "vs_baseline": max_rel,  # worst relative gradient deviation
    }))


def main():
    from microbeseg_tpu.config import ModelConfig
    from microbeseg_tpu.models.unet import build_unet
    from microbeseg_tpu.ops.postprocessing import distance_postprocessing

    rng = np.random.default_rng(0)
    model = build_unet(ModelConfig())  # flagship DUNet, bf16 compute
    images = jnp.asarray(
        rng.standard_normal((BATCH, SIZE, SIZE, 1)).astype(np.float32))
    variables = _random_variables(model, images)

    # ---- stage 1: forward ------------------------------------------------
    # fori_loop with a *traced* bound: one executable serves both the n and
    # 2n timing runs (halves the compile cost of the benchmark)
    @jax.jit
    def fwd_chain(variables, x, s, n):
        def body(_, carry):
            x, acc = carry
            border, cell = model.apply(variables, x, train=False)
            return x + s * cell, acc + border[0, 0, 0, 0] + cell[0, 0, 0, 0]
        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc

    fwd_ms = _slope_ms(lambda v, x, s, n: fwd_chain(v, x, s, n),
                       (variables, images), n=10)

    # ---- stage 2: post-processing ---------------------------------------
    borders_np, cells_np = _blob_predictions(rng, BATCH)
    borders = jnp.asarray(borders_np)
    cells = jnp.asarray(cells_np)

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
                        (cells, borders), n=25)

    per_crop_ms = max(fwd_ms, 0.0) + max(post_ms, 0.0)
    crops_per_sec = 1e3 / per_crop_ms
    print(f"# fwd {fwd_ms:.3f} ms/crop, post {post_ms:.3f} ms/crop",
          file=sys.stderr)

    # training-throughput stage (full train step: on-device augmentation +
    # fwd/bwd + Ranger) — ON by default so the driver-recorded JSON carries
    # both halves of the BASELINE metric ("infer + train"); BENCH_TRAIN=0
    # skips it for quick inference-only runs
    train_ms = None
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        train_ms = _train_slope_ms(model, images)
        print(f"# train {train_ms:.3f} ms/crop "
              f"({1e3 / train_ms:.1f} crops/s/chip)", file=sys.stderr)
    basis = _baseline_basis(borders_np, cells_np)
    out = {
        "metric": "256^2 crops/sec/chip (DUNet fwd + on-device watershed postproc)",
        "value": round(crops_per_sec, 2),
        "unit": "crops/s",
        "vs_baseline": round(crops_per_sec / basis["ref_crops_per_sec"], 2),
        "vs_baseline_cpu_measured": round(
            crops_per_sec / basis["ref_crops_per_sec_cpu_measured"], 1),
        "baseline_basis": basis,
    }
    if train_ms is not None:
        out["train_crops_per_sec"] = round(1e3 / train_ms, 2)
        out["train_ms_per_crop"] = round(train_ms, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--mesh" in sys.argv:
        mesh_main()
    else:
        main()
