"""Data-parallel scaling correctness (SURVEY.md §5.8, VERDICT round-1 #10).

The sharded train step over an N-device mesh must be numerically equivalent
to the single-device step: same batches, same RNG keys -> same loss and same
updated parameters.  XLA's psum gradient all-reduce and global-batch
reductions are exercised on the genuine 8-virtual-CPU mesh the whole test
session runs on.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from microbeseg_tpu.config import ModelConfig, TrainConfig
from microbeseg_tpu.training.data import SplitArrays, TrainingData
from microbeseg_tpu.training.trainer import Trainer


def _toy_data(rng, n=8, size=16):
    images = rng.integers(0, 65535, (n, size, size, 1)).astype(np.float32)
    labels = {
        "border_label": rng.random((n, size, size, 1)).astype(np.float32),
        "cell_label": rng.random((n, size, size, 1)).astype(np.float32)}
    split = SplitArrays(images=images, labels=labels,
                        ids=[str(i) for i in range(n)])
    return TrainingData(train=split, val=split, crop_size=size)


def _cfg(run_name, norm="gn"):
    return TrainConfig(
        model=ModelConfig(filters=(8, 16), act_fun="mish",
                          normalization=norm),
        optimizer="adam", batch_size=8, run_name=run_name,
        max_epochs=20,  # schedules need >= 20 for integer patience
        compute_dtype="float32", seed=42)


class TestDataParallelEquivalence:
    @pytest.mark.parametrize("norm", ["gn", "bn"])
    def test_single_step_mesh8_matches_mesh1(self, tmp_path, rng, norm):
        """ONE sharded step on the 8-device mesh produces the same loss,
        GRADIENTS, and — for 'bn' — the same global-batch statistics as the
        1-device step (exercises the psum grad all-reduce and the sync-BN
        reductions XLA inserts).  Gradients, not post-Adam params: step-1
        Adam ~ lr*sign(grad), which amplifies 1e-7 reduction-order noise on
        near-zero gradients to O(lr)."""
        from microbeseg_tpu.ops.augment import augment_batch
        from microbeseg_tpu.parallel.mesh import (
            batch_sharding, get_mesh, replicated_sharding)

        data = _toy_data(rng)
        out = {}
        for n_dev in (1, 8):
            cfg = _cfg(f"dp{n_dev}_model_01", norm=norm)
            trainer = Trainer(cfg, tmp_path / f"m{n_dev}",
                              mesh=get_mesh(n_dev))
            model, batch_loss = trainer.model, trainer.loss_fn
            variables = model.init(jax.random.PRNGKey(7),
                                   jnp.zeros((1, 16, 16, 1)), train=False)
            has_bs = "batch_stats" in variables

            def grad_step(params, bs, images, labels, weights, key):
                aug_img, aug_labels = augment_batch(key, images, labels,
                                                    "distance")

                def losses(p):
                    v = {"params": p}
                    if has_bs:
                        v["batch_stats"] = bs
                        preds, mut = model.apply(v, aug_img, train=True,
                                                 mutable=["batch_stats"])
                        return (batch_loss(preds, aug_labels, weights),
                                mut["batch_stats"])
                    preds = model.apply(v, aug_img, train=True)
                    return batch_loss(preds, aug_labels, weights), bs

                (loss, new_bs), grads = jax.value_and_grad(
                    losses, has_aux=True)(params)
                return loss, grads, new_bs

            mesh = trainer.mesh
            bsh, rsh = batch_sharding(mesh), replicated_sharding(mesh)
            grad_step = jax.jit(grad_step,
                                in_shardings=(rsh, rsh, bsh, bsh, bsh, rsh),
                                out_shardings=(rsh, rsh, rsh))
            loss, grads, new_bs = grad_step(
                variables["params"], variables.get("batch_stats", {}),
                data.train.images, data.train.labels,
                jnp.ones(8), jax.random.PRNGKey(11))
            out[n_dev] = (float(loss), jax.device_get(grads),
                          jax.device_get(new_bs))

        # atol 1e-5: the augmentation stage runs interpolation-matrix
        # matmuls whose f32 accumulation order is sharding-dependent, so
        # shards see reduction-noise-level input differences
        assert np.isclose(out[1][0], out[8][0], rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(out[1][1]),
                        jax.tree_util.tree_leaves(out[8][1])):
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)
        if norm == "bn":
            for a, b in zip(jax.tree_util.tree_leaves(out[1][2]),
                            jax.tree_util.tree_leaves(out[8][2])):
                np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)

    def test_epoch_loss_history_mesh8_matches_mesh1(self, tmp_path, rng):
        """Full training-protocol equivalence at reporting precision: the
        per-epoch loss lines match between mesh sizes."""
        data = _toy_data(rng)
        losses = {}
        from microbeseg_tpu.parallel.mesh import get_mesh
        for n_dev in (1, 8):
            cfg = _cfg(f"dp{n_dev}_model_01")
            trainer = Trainer(cfg, tmp_path / f"m{n_dev}",
                              mesh=get_mesh(n_dev))
            msgs = []
            trainer.text_output = msgs.append
            trainer.train(data)
            losses[n_dev] = [m.split(":", 1)[1] for m in msgs if "Loss" in m][:3]
        assert losses[1] == losses[8]

    def test_full_ranger_bn_run_mesh8_matches_mesh1(self, tmp_path, rng):
        """FULL training-protocol equivalence under the mesh (VERDICT r3
        item 6): a complete Ranger run — multi-epoch main phase with
        plateau break, best-val checkpointing, the second cosine fine-tune
        phase resumed from the best checkpoint (reference train.py:229-252)
        — with 'bn' global-batch statistics (sync-BN reductions + the
        per-epoch precise-BN recalibration), mesh8 vs mesh1: identical loss
        history at reporting precision and matching final checkpoints."""
        from microbeseg_tpu.models.io import load_model
        from microbeseg_tpu.parallel.mesh import get_mesh

        data = _toy_data(rng)
        ckpts, histories = {}, {}
        for n_dev in (1, 8):
            cfg = TrainConfig(
                model=ModelConfig(filters=(8, 16), act_fun="mish",
                                  normalization="bn"),
                optimizer="ranger", batch_size=8, run_name="dp_model_01",
                max_epochs=20, compute_dtype="float32", seed=42)
            trainer = Trainer(cfg, tmp_path / f"m{n_dev}",
                              mesh=get_mesh(n_dev))
            msgs = []
            trainer.text_output = msgs.append
            trainer.fit(data)  # full 2-phase protocol + sidecar
            histories[n_dev] = [m.split(":", 1)[1]
                                for m in msgs if "Loss" in m]
            _, variables, _ = load_model(
                tmp_path / f"m{n_dev}" / "dp_model_01",
                dtype=jnp.float32)
            ckpts[n_dev] = jax.device_get(variables)
        # the second Ranger phase must actually have run (two phases of
        # epochs in the history) or the test is vacuous
        assert len(histories[1]) >= 3
        assert histories[1] == histories[8]
        for a, b in zip(jax.tree_util.tree_leaves(ckpts[1]),
                        jax.tree_util.tree_leaves(ckpts[8])):
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)

    def test_batch_shards_over_devices(self, rng):
        """The batch axis of a sharded step input actually lands one shard
        per device (addressable shard inspection)."""
        from microbeseg_tpu.parallel.mesh import batch_sharding, get_mesh

        mesh = get_mesh(8)
        x = jax.device_put(np.arange(8 * 4, dtype=np.float32).reshape(8, 4),
                           batch_sharding(mesh))
        shards = x.addressable_shards
        assert len(shards) == 8
        assert all(s.data.shape == (1, 4) for s in shards)
        assert sorted(int(s.data[0, 0]) for s in shards) == [
            i * 4 for i in range(8)]
