"""Training-stack tests: losses, Ranger-in-optax, schedules, augmentation,
and an end-to-end smoke train over the 8-device virtual mesh (SURVEY.md §4(c,d))."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from microbeseg_tpu.config import ModelConfig, TrainConfig, get_max_epochs
from microbeseg_tpu.ops.augment import augment_batch, clahe
from microbeseg_tpu.training.losses import ce_dice, get_loss, smooth_l1
from microbeseg_tpu.training.optimizers import (
    build_optimizer,
    gradient_centralization,
    lookahead,
    ranger,
    set_learning_rate,
)
from microbeseg_tpu.training.schedules import CosineAnnealingLR, ReduceLROnPlateau


class TestLosses:
    def test_smooth_l1_matches_torch_formula(self):
        pred = jnp.array([0.0, 0.5, 2.0])
        target = jnp.array([0.0, 0.0, 0.0])
        # elements: 0, 0.5*0.25=0.125, 2-0.5=1.5 -> mean
        expected = (0 + 0.125 + 1.5) / 3
        assert np.isclose(float(smooth_l1(pred, target)), expected)

    def test_distance_loss_two_heads(self):
        loss = get_loss("smooth_l1", "distance")
        pred = (jnp.ones((2, 8, 8, 1)), jnp.zeros((2, 8, 8, 1)))
        batch = {"border_label": jnp.zeros((2, 8, 8, 1)),
                 "cell_label": jnp.zeros((2, 8, 8, 1))}
        assert np.isclose(float(loss(pred, batch)), 0.5)  # smooth_l1(1,0)=0.5

    def test_ce_dice_perfect_prediction_small(self):
        labels = jnp.zeros((1, 8, 8), jnp.int32).at[0, 2:6, 2:6].set(1)
        logits = jax.nn.one_hot(labels, 3) * 20.0
        loss = float(ce_dice(logits, labels))
        assert loss < 0.01

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            get_loss("nope", "distance")

    def test_batch_ce_dice_matches_whole_batch_reference(self, rng):
        """Reference losses.py:40-68 flattens the WHOLE batch for the dice
        term; a per-sample average differs because dice is nonlinear
        (ADVICE round-1).  Padded weight-0 slots must contribute nothing."""
        from microbeseg_tpu.training.losses import (
            cross_entropy, get_batch_loss)

        labels = rng.integers(0, 3, (3, 8, 8)).astype(np.int32)
        logits = rng.normal(size=(3, 8, 8, 3)).astype(np.float32)

        # numpy oracle of the reference: CE mean + 0.5 * sum_c c * dice_c
        # with dice over the flattened batch
        def softmax(x):
            e = np.exp(x - x.max(-1, keepdims=True))
            return e / e.sum(-1, keepdims=True)

        probs = softmax(logits)
        onehot = np.eye(3)[labels]
        dice = 0.0
        for c in (1, 2):
            p, t = probs[..., c].ravel(), onehot[..., c].ravel()
            inter = (p * t).sum()
            dice += c * (1 - (2 * inter + 1) / ((t * t).sum() + (p * p).sum() + 1))
        ce = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
        expected_sum = (ce + 0.5 * dice) * 3  # sum convention: x n_real

        fn = get_batch_loss("ce_dice", "boundary")
        got = float(fn(jnp.asarray(logits),
                       {"label": jnp.asarray(labels[..., None])},
                       jnp.ones(3)))
        assert np.isclose(got, expected_sum, rtol=1e-5)

        # weight-0 padding slot changes nothing
        logits_p = np.concatenate([logits, rng.normal(size=(1, 8, 8, 3))]).astype(np.float32)
        labels_p = np.concatenate([labels, labels[:1]])
        got_p = float(fn(jnp.asarray(logits_p),
                         {"label": jnp.asarray(labels_p[..., None])},
                         jnp.array([1.0, 1.0, 1.0, 0.0])))
        assert np.isclose(got_p, expected_sum, rtol=1e-5)

    def test_epoch_batches_respects_logical_batch_size(self):
        """With step_size > batch_size (mesh round-up) each step still draws
        only batch_size REAL samples; extras are weight-0 (ADVICE round-1)."""
        from microbeseg_tpu.training.data import epoch_batches

        rng_np = np.random.default_rng(0)
        batches = list(epoch_batches(10, 4, rng_np, shuffle=True, step_size=8))
        assert len(batches) == 3  # ceil(10/4)
        seen = []
        for idx, w in batches:
            assert idx.shape == (8,) and w.shape == (8,)
            assert w.sum() <= 4  # never more than the configured batch size
            seen.extend(idx[w > 0].tolist())
        assert sorted(seen) == list(range(10))  # each sample exactly once


class TestOptimizers:
    def test_gradient_centralization(self):
        gc = gradient_centralization()
        grads = {"w": jnp.ones((3, 3, 2, 4)), "b": jnp.ones((4,))}
        state = gc.init(grads)
        out, _ = gc.update(grads, state)
        assert np.allclose(np.asarray(out["w"]), 0)   # constant grad -> centered to 0
        assert np.allclose(np.asarray(out["b"]), 1)   # 1-dim untouched

    def test_lookahead_sync(self):
        la = lookahead(alpha=0.5, k=2)
        params = {"w": jnp.zeros(3)}
        state = la.init(params)
        u = {"w": jnp.ones(3)}
        # step 1: no sync
        out, state = la.update(u, state, params)
        np.testing.assert_allclose(np.asarray(out["w"]), 1.0)
        params = jax.tree.map(lambda p, g: p + g, params, out)
        # step 2: sync -> final = slow + 0.5*(fast_new - slow) = 0 + 0.5*2 = 1
        out, state = la.update(u, state, params)
        final = params["w"] + out["w"]
        np.testing.assert_allclose(np.asarray(final), 1.0)

    def test_ranger_reduces_quadratic(self):
        tx = ranger(1e-1)
        params = jnp.array([3.0, -2.0])
        state = tx.init(params)
        for _ in range(150):
            grads = 2 * params
            updates, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        assert float(jnp.sum(params ** 2)) < 1.0

    def test_inject_lr_settable(self):
        cfg = TrainConfig(optimizer="ranger")
        tx, lr = build_optimizer(cfg)
        assert np.isclose(lr, 6e-3)
        state = tx.init({"w": jnp.zeros(2)})
        state = set_learning_rate(state, 1e-4)
        assert np.isclose(float(state.hyperparams["learning_rate"]), 1e-4)

    def test_finetune_lr(self):
        cfg = TrainConfig(optimizer="ranger")
        _, lr = build_optimizer(cfg, second_run=True)
        assert np.isclose(lr, 0.09 * 6e-3)


class TestSchedules:
    def test_plateau_reduces_after_patience(self):
        s = ReduceLROnPlateau(1.0, factor=0.5, patience=2, min_lr=0.1)
        assert s.step(1.0) == 1.0       # new best
        assert s.step(1.0) == 1.0       # bad 1
        assert s.step(1.0) == 1.0       # bad 2
        assert s.step(1.0) == 0.5       # bad 3 > patience -> reduce
        for _ in range(10):
            s.step(1.0)
        assert s.lr >= 0.1

    def test_cosine(self):
        s = CosineAnnealingLR(1.0, t_max=10, eta_min=0.0)
        lrs = [s.step() for _ in range(10)]
        assert lrs[0] < 1.0 and np.isclose(lrs[-1], 0.0, atol=1e-9)
        assert all(a >= b for a, b in zip(lrs, lrs[1:]))

    def test_max_epochs_heuristic(self):
        assert get_max_epochs(1200, 320) == 200
        assert get_max_epochs(30, 320) == 560
        assert get_max_epochs(1200, 80) == 400  # 200*sqrt(4)=400


class TestAugment:
    def _batch(self, rng, n=4, size=48):
        images = rng.integers(0, 65535, (n, size, size, 1)).astype(np.float32)
        labels = {
            "border_label": rng.random((n, size, size, 1)).astype(np.float32),
            "cell_label": rng.random((n, size, size, 1)).astype(np.float32),
        }
        return jnp.asarray(images), {k: jnp.asarray(v) for k, v in labels.items()}

    def test_shapes_and_range(self, rng):
        images, labels = self._batch(rng)
        key = jax.random.PRNGKey(0)
        out_img, out_lab = augment_batch(key, images, labels, "distance")
        assert out_img.shape == images.shape
        assert float(out_img.min()) >= -1.0 - 1e-5
        assert float(out_img.max()) <= 1.0 + 1e-5
        for k, v in out_lab.items():
            assert v.shape == labels[k].shape

    def test_deterministic_per_key(self, rng):
        images, labels = self._batch(rng, n=2)
        key = jax.random.PRNGKey(7)
        a = augment_batch(key, images, labels, "distance")
        b = augment_batch(key, images, labels, "distance")
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

    def test_clahe_flattens_histogram(self, rng):
        # a low-contrast image should span more of [0,1] after CLAHE
        img = (0.4 + 0.1 * rng.random((64, 64))).astype(np.float32)
        out = np.asarray(clahe(jnp.asarray(img)))
        assert out.max() - out.min() > 0.4
        assert out.shape == img.shape

    def test_clahe_handles_non_tile_multiple_sizes(self, rng):
        # skimage pads to a tile multiple; so does the matmul CLAHE
        img = (0.3 + 0.4 * rng.random((100, 70))).astype(np.float32)
        out = np.asarray(clahe(jnp.asarray(img)))
        assert out.shape == (100, 70)
        assert 0.0 <= out.min() and out.max() <= 1.0

    def test_affine_pure_scale_matches_scipy_bilinear(self, rng):
        """For axis-aligned maps the 2-pass einsum resample equals direct
        bilinear map_coordinates exactly (up to bf16 weight quantization)."""
        from scipy.ndimage import map_coordinates

        from microbeseg_tpu.ops.augment import _affine_resample

        x = rng.random((64, 64, 1)).astype(np.float32)
        sy, sx = 1.1, 0.9
        out = np.asarray(_affine_resample(
            jnp.asarray(x), jnp.float32(0.0), jnp.float32(sy),
            jnp.float32(sx), 1))[..., 0]
        yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
        cy = cx = 31.5
        ref = map_coordinates(x[..., 0], [(yy - cy) / sy + cy,
                                          (xx - cx) / sx + cx],
                              order=1, mode="constant")
        np.testing.assert_allclose(out, ref, atol=0.01)

    def test_affine_rotation_geometry_and_order0(self, rng):
        """Rotation: the 2-pass decomposition lands samples at the right
        coordinates (mean error vs direct bilinear is interpolation-level
        on smooth images); order-0 at angle 0 is exact."""
        from scipy.ndimage import map_coordinates

        from microbeseg_tpu.ops.augment import _affine_resample

        yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
        smooth = (np.sin(yy / 6) * np.cos(xx / 7) * 0.5 + 0.5
                  ).astype(np.float32)[..., None]
        ang, sy, sx = 0.5, 0.95, 1.1
        out = np.asarray(_affine_resample(
            jnp.asarray(smooth), jnp.float32(ang), jnp.float32(sy),
            jnp.float32(sx), 1))[..., 0]
        cy = cx = 31.5
        ca, sa = np.cos(-ang), np.sin(-ang)
        ry = ca * (yy - cy) - sa * (xx - cx)
        rx = sa * (yy - cy) + ca * (xx - cx)
        ref = map_coordinates(smooth[..., 0], [ry / sy + cy, rx / sx + cx],
                              order=1, mode="constant")
        assert np.abs(out - ref).mean() < 0.01

        lab = rng.integers(0, 4, (64, 64, 1)).astype(np.float32)
        out0 = np.asarray(_affine_resample(
            jnp.asarray(lab), jnp.float32(0.0), jnp.float32(1.07),
            jnp.float32(0.93), 0))[..., 0]
        ref0 = map_coordinates(lab[..., 0],
                               [(yy - cy) / 1.07 + cy, (xx - cx) / 0.93 + cx],
                               order=0, mode="constant")
        np.testing.assert_array_equal(out0, ref0)

    def test_bisection_quantiles_match_numpy(self, rng):
        from microbeseg_tpu.ops.augment import _quantiles

        img = (rng.random((128, 128, 1)) * 65535).astype(np.float32)
        qs = np.array([0.002, 0.5, 0.998], np.float32)
        mine = np.asarray(_quantiles(jnp.asarray(img), jnp.asarray(qs)))
        ref = np.quantile(img, qs)
        # inverse-CDF of a discrete sample: within one order-statistic gap
        span = img.max() - img.min()
        assert np.all(np.abs(mine - ref) < 0.002 * span)


class TestFinetuneInit:
    def test_fit_init_from_warm_starts_first_run(self, tmp_path, rng):
        """fit(init_from=stem) loads the checkpoint into the FIRST run's
        init (fine-tuning, beyond reference) — captured via train()."""
        from microbeseg_tpu.config import ModelConfig, TrainConfig
        from microbeseg_tpu.models.io import (load_checkpoint, save_checkpoint,
                                              variables_template)
        from microbeseg_tpu.training.data import SplitArrays, TrainingData
        from microbeseg_tpu.training.trainer import Trainer

        n, size = 4, 16
        images = rng.integers(0, 65535, (n, size, size, 1)).astype(np.float32)
        labels = {
            "border_label": rng.random((n, size, size, 1)).astype(np.float32),
            "cell_label": rng.random((n, size, size, 1)).astype(np.float32)}
        split = SplitArrays(images=images, labels=labels,
                            ids=[str(i) for i in range(n)])
        data = TrainingData(train=split, val=split, crop_size=size)
        cfg = TrainConfig(
            model=ModelConfig(filters=(8, 16), act_fun="relu",
                              normalization="gn"),
            optimizer="adam", batch_size=4, run_name="distance_model_01",
            max_epochs=20, compute_dtype="float32", seed=5)

        # make a "pretrained" checkpoint with recognizable constant leaves
        template = variables_template(
            Trainer(cfg, tmp_path / "a").model, (size, size), ch_in=1)
        marked = jax.tree.map(
            lambda x: jnp.full_like(x, 0.125), template["params"])
        save_checkpoint({"params": marked}, tmp_path / "pre.ckpt")

        captured = {}
        t = Trainer(cfg, tmp_path / "b")
        orig_train = t.train

        def spy(data, best_loss=1e4, print_output=False, resume=False,
                init_vars=None):
            if best_loss >= 1e3:  # first run only
                captured["init_vars"] = init_vars
                t.stopped = True  # skip the actual training loop
                return 1e4
            return orig_train(data, best_loss, print_output, resume,
                              init_vars)

        t.train = spy
        t.fit(data, init_from=tmp_path / "pre")
        assert captured["init_vars"] is not None
        got = captured["init_vars"][0]
        ref = load_checkpoint({"params": template["params"]},
                              tmp_path / "pre.ckpt")["params"]
        assert jax.tree.structure(got) == jax.tree.structure(ref)
        flat = jax.tree.leaves(got)
        assert all(float(jnp.max(jnp.abs(leaf - 0.125))) == 0.0
                   for leaf in flat)


class TestTrainStateResume:
    def test_interrupted_run_resumes_bit_identically(self, tmp_path, rng):
        """A run interrupted after 2 epochs and resumed from its training
        snapshot (params + optimizer state + RNG streams + scheduler)
        produces EXACTLY the same per-epoch losses as an uninterrupted run —
        mid-training resume the reference lacks (SURVEY §5.4)."""
        import dataclasses

        from microbeseg_tpu.config import ModelConfig, TrainConfig
        from microbeseg_tpu.training.data import SplitArrays, TrainingData
        from microbeseg_tpu.training.trainer import Trainer

        n, size = 8, 16
        images = rng.integers(0, 65535, (n, size, size, 1)).astype(np.float32)
        labels = {
            "border_label": rng.random((n, size, size, 1)).astype(np.float32),
            "cell_label": rng.random((n, size, size, 1)).astype(np.float32)}
        split = SplitArrays(images=images, labels=labels,
                            ids=[str(i) for i in range(n)])
        data = TrainingData(train=split, val=split, crop_size=size)
        cfg = TrainConfig(
            model=ModelConfig(filters=(8, 16), act_fun="relu",
                              normalization="gn"),
            optimizer="adam", batch_size=4, run_name="distance_model_01",
            max_epochs=20, compute_dtype="float32", seed=5,
            train_state_every=1)

        def losses_of(msgs):
            return [m.split(":", 1)[1].split("-->")[0].strip()
                    for m in msgs if "Loss" in m]

        # uninterrupted 4-epoch run
        full_cfg = dataclasses.replace(cfg, max_epochs=20)
        t_full = Trainer(full_cfg, tmp_path / "full")
        msgs_full = []
        t_full.text_output = msgs_full.append
        # max_epochs drives the schedules (same both runs); bound the epoch
        # count via should_stop, which the loop checks at each epoch start
        t_full.should_stop = lambda: len(losses_of(msgs_full)) >= 4
        t_full.train(data)
        full_losses = losses_of(msgs_full)[:4]

        # interrupted after 2 epochs, then resumed
        t_a = Trainer(cfg, tmp_path / "resumed")
        msgs_a = []
        t_a.text_output = msgs_a.append
        t_a.should_stop = lambda: len(losses_of(msgs_a)) >= 2
        t_a.train(data)

        t_b = Trainer(cfg, tmp_path / "resumed")
        msgs_b = []
        t_b.text_output = msgs_b.append
        t_b.should_stop = lambda: len(losses_of(msgs_b)) >= 2
        t_b.train(data, resume=True)
        assert any("Resume training from epoch 3" in m for m in msgs_b)

        resumed_losses = losses_of(msgs_a)[:2] + losses_of(msgs_b)[:2]
        assert resumed_losses == full_losses

    def test_crash_leaves_consistent_snapshot_and_checkpoint(
            self, tmp_path, rng, monkeypatch):
        """Deferred best-checkpoint flushing must still keep the mid-training
        snapshot and the on-disk .ckpt consistent: save_train_state records
        best_loss, so the matching weights are force-flushed alongside it —
        a crash between an improvement and the timer flush must not strand a
        snapshot whose best_loss has no weights on disk (the resumed run may
        never beat it and would then fine-tune stale weights)."""
        from microbeseg_tpu.config import ModelConfig, TrainConfig
        from microbeseg_tpu.training.data import SplitArrays, TrainingData
        from microbeseg_tpu.training.trainer import Trainer

        monkeypatch.setattr(Trainer, "_FLUSH_SECS", 1e9)  # timer never fires
        n, size = 8, 16
        images = rng.integers(0, 65535, (n, size, size, 1)).astype(np.float32)
        labels = {
            "border_label": rng.random((n, size, size, 1)).astype(np.float32),
            "cell_label": rng.random((n, size, size, 1)).astype(np.float32)}
        split = SplitArrays(images=images, labels=labels,
                            ids=[str(i) for i in range(n)])
        data = TrainingData(train=split, val=split, crop_size=size)
        cfg = TrainConfig(
            model=ModelConfig(filters=(8, 16), act_fun="relu",
                              normalization="gn"),
            optimizer="adam", batch_size=4, run_name="distance_model_01",
            max_epochs=20, compute_dtype="float32", seed=5,
            train_state_every=1)

        t = Trainer(cfg, tmp_path / "crash")
        msgs = []
        t.text_output = msgs.append

        def boom():
            if sum("Loss" in m for m in msgs) >= 2:
                raise RuntimeError("simulated crash")
            return False

        t.should_stop = boom
        with pytest.raises(RuntimeError, match="simulated crash"):
            t.train(data)
        ckpt = tmp_path / "crash" / "distance_model_01.ckpt"
        state = tmp_path / "crash" / "distance_model_01_state.train_state"
        assert state.is_file()  # the crash left a resumable snapshot...
        assert ckpt.is_file()   # ...AND the matching best checkpoint

        # the resumed run loads both and finishes the phase
        t2 = Trainer(cfg, tmp_path / "crash")
        msgs2 = []
        t2.text_output = msgs2.append
        t2.should_stop = lambda: False
        t2.train(data, resume=True)
        assert any("Resume training from epoch" in m for m in msgs2)
        assert ckpt.is_file()

    def test_snapshot_deleted_after_completed_fit(self, tmp_path, rng):
        """A finished run drops its resumable snapshot so a later --resume
        cannot latch onto the completed run and overwrite its checkpoint."""
        from microbeseg_tpu.config import ModelConfig, TrainConfig
        from microbeseg_tpu.training.data import SplitArrays, TrainingData
        from microbeseg_tpu.training.trainer import Trainer

        images = rng.integers(0, 65535, (8, 16, 16, 1)).astype(np.float32)
        labels = {
            "border_label": rng.random((8, 16, 16, 1)).astype(np.float32),
            "cell_label": rng.random((8, 16, 16, 1)).astype(np.float32)}
        split = SplitArrays(images=images, labels=labels,
                            ids=[str(i) for i in range(8)])
        data = TrainingData(train=split, val=split, crop_size=16)
        cfg = TrainConfig(model=ModelConfig(filters=(8, 16), act_fun="relu",
                                            normalization="gn"),
                          optimizer="adam", batch_size=4, max_epochs=20,
                          run_name="distance_model_01",
                          compute_dtype="float32", train_state_every=1)
        trainer = Trainer(cfg, tmp_path)
        msgs = []
        trainer.text_output = msgs.append
        trainer.should_stop = lambda: sum("Loss" in m for m in msgs) >= 2
        trainer.fit(data)
        # should_stop fires mid-run -> stopped -> snapshot kept
        state = tmp_path / "distance_model_01_state.train_state"
        assert state.is_file()

        trainer2 = Trainer(cfg, tmp_path)
        trainer2.text_output = lambda m: None
        # let it run to the break condition quickly by resuming and
        # stopping never; max_epochs=20 with adam break 2*20//20+5=7
        trainer2.fit(data, resume=True)
        assert not state.is_file()
        assert not state.with_suffix(".train_state.json").is_file()

    def test_resume_without_snapshot_starts_fresh(self, tmp_path, rng):
        from microbeseg_tpu.config import ModelConfig, TrainConfig
        from microbeseg_tpu.training.data import SplitArrays, TrainingData
        from microbeseg_tpu.training.trainer import Trainer

        images = rng.integers(0, 65535, (8, 16, 16, 1)).astype(np.float32)
        labels = {
            "border_label": rng.random((8, 16, 16, 1)).astype(np.float32),
            "cell_label": rng.random((8, 16, 16, 1)).astype(np.float32)}
        split = SplitArrays(images=images, labels=labels,
                            ids=[str(i) for i in range(8)])
        data = TrainingData(train=split, val=split, crop_size=16)
        cfg = TrainConfig(model=ModelConfig(filters=(8, 16), act_fun="relu",
                                            normalization="gn"),
                          optimizer="adam", batch_size=4, max_epochs=20,
                          run_name="distance_model_01",
                          compute_dtype="float32")
        trainer = Trainer(cfg, tmp_path)
        msgs = []
        trainer.text_output = msgs.append
        trainer.should_stop = lambda: any("Loss" in m for m in msgs)
        trainer.train(data, resume=True)
        assert any("No training snapshot found" in m for m in msgs)


class TestBatchNormRecalibration:
    def test_recalibration_aligns_eval_with_train_mode(self, tmp_path, rng):
        """After precise-BN re-estimation, eval-mode (running-stat) outputs
        match train-mode (batch-stat) outputs on the train distribution —
        the fix for the reference-default 'bn' collapse (VERDICT item 4)."""
        from microbeseg_tpu.models.io import load_checkpoint, save_checkpoint
        from microbeseg_tpu.ops.augment import normalize_val
        from microbeseg_tpu.training.data import SplitArrays, TrainingData
        from microbeseg_tpu.training.trainer import Trainer

        n, size = 16, 16
        images = rng.integers(0, 65535, (n, size, size, 1)).astype(np.float32)
        labels = {
            "border_label": rng.random((n, size, size, 1)).astype(np.float32),
            "cell_label": rng.random((n, size, size, 1)).astype(np.float32)}
        split = SplitArrays(images=images, labels=labels,
                            ids=[str(i) for i in range(n)])
        data = TrainingData(train=split, val=split, crop_size=size)

        cfg = TrainConfig(model=ModelConfig(filters=(4, 8),
                                            normalization="bn"),
                          batch_size=8, run_name="bn_model_01",
                          compute_dtype="float32")
        trainer = Trainer(cfg, tmp_path)
        variables = trainer.model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 1)),
            train=False)
        # poison the running stats (mimicking augmentation drift)
        bad_bs = jax.tree.map(
            lambda s: jnp.full_like(s, 7.0), variables["batch_stats"])
        save_checkpoint({"params": variables["params"],
                         "batch_stats": bad_bs}, tmp_path / cfg.run_name)

        def eval_out(bs):
            return trainer.model.apply(
                {"params": variables["params"], "batch_stats": bs},
                normalize_val(jnp.asarray(images)), train=False)

        def train_mode_out():
            out, _ = trainer.model.apply(
                {"params": variables["params"],
                 "batch_stats": bad_bs},
                normalize_val(jnp.asarray(images)), train=True,
                mutable=["batch_stats"])
            return out

        ref_border, ref_cell = train_mode_out()
        bad_border, _ = eval_out(bad_bs)
        bad_err = float(jnp.abs(bad_border - ref_border).mean())

        trainer.recalibrate_batch_stats(data)
        new_vars = load_checkpoint(jax.device_get(dict(variables)),
                                   tmp_path / f"{cfg.run_name}.ckpt")
        good_border, good_cell = eval_out(new_vars["batch_stats"])
        good_err = float(jnp.abs(good_border - ref_border).mean())
        # full-set batch stats == recalibrated running stats (up to the
        # batch-vs-whole-set moment split), so eval must track train mode
        assert good_err < 0.05
        assert good_err < bad_err / 5

    def test_recalibration_noop_for_groupnorm(self, tmp_path, rng):
        from microbeseg_tpu.training.data import SplitArrays, TrainingData
        from microbeseg_tpu.training.trainer import Trainer

        n, size = 4, 16
        split = SplitArrays(
            images=rng.integers(0, 99, (n, size, size, 1)).astype(np.float32),
            labels={"border_label": np.zeros((n, size, size, 1), np.float32),
                    "cell_label": np.zeros((n, size, size, 1), np.float32)},
            ids=[str(i) for i in range(n)])
        data = TrainingData(train=split, val=split, crop_size=size)
        cfg = TrainConfig(model=ModelConfig(filters=(8, 16),
                                            normalization="gn"),
                          batch_size=4, run_name="gn_model_01",
                          compute_dtype="float32")
        Trainer(cfg, tmp_path).recalibrate_batch_stats(data)  # no ckpt needed


class TestSmokeTrain:
    def test_loss_decreases_and_checkpoints(self, tmp_path, rng):
        """End-to-end: synthetic blob distance dataset, tiny DUNet, sharded
        train step over the 8-device CPU mesh."""
        from tests.conftest import synthetic_blobs
        from tests.oracles import distance_label_oracle, regionprops_oracle
        from microbeseg_tpu.training.data import SplitArrays, TrainingData
        from microbeseg_tpu.training.trainer import Trainer

        def make_split(n):
            imgs, borders, cells, ids = [], [], [], []
            for i in range(n):
                mask = synthetic_blobs(rng, shape=(48, 48), n_blobs=4)
                props = regionprops_oracle(mask)
                mal = max(p["major_axis_length"] for p in props)
                cell, nb = distance_label_oracle(mask, int(np.ceil(0.75 * mal)))
                img = (mask > 0).astype(np.float32) * 40000 + 5000
                imgs.append(img[..., None])
                cells.append(cell[..., None])
                borders.append(nb[..., None])
                ids.append(f"img_{i}")
            return SplitArrays(
                images=np.stack(imgs),
                labels={"border_label": np.stack(borders),
                        "cell_label": np.stack(cells)},
                ids=ids)

        data = TrainingData(train=make_split(8), val=make_split(4),
                            crop_size=48)
        cfg = TrainConfig(model=ModelConfig(filters=(8, 32)),
                          optimizer="adam", batch_size=8, max_epochs=3,
                          run_name="smoke_model_01", compute_dtype="float32")
        logs = []
        trainer = Trainer(cfg, tmp_path, text_output=logs.append)
        best = trainer.train(data)
        assert best < 1e4
        assert (tmp_path / "smoke_model_01.ckpt").exists()
        assert (tmp_path / "smoke_model_01_loss.txt").exists()
        hist = np.loadtxt(tmp_path / "smoke_model_01_loss.txt",
                          delimiter=",", skiprows=1, ndmin=2)
        assert hist.shape[0] == 3

    def test_ranger_fit_writes_sidecar(self, tmp_path, rng):
        from tests.conftest import synthetic_blobs
        from tests.oracles import distance_label_oracle, regionprops_oracle
        from microbeseg_tpu.training.data import SplitArrays, TrainingData
        from microbeseg_tpu.training.trainer import Trainer
        import json

        def quick_split(n):
            imgs, borders, cells = [], [], []
            for i in range(n):
                mask = synthetic_blobs(rng, shape=(32, 32), n_blobs=2)
                img = (mask > 0).astype(np.float32) * 30000
                imgs.append(img[..., None])
                cells.append((mask > 0).astype(np.float32)[..., None])
                borders.append(np.zeros_like(img)[..., None])
            return SplitArrays(images=np.stack(imgs),
                               labels={"border_label": np.stack(borders),
                                       "cell_label": np.stack(cells)},
                               ids=[f"img_{i}" for i in range(n)])

        data = TrainingData(train=quick_split(4), val=quick_split(2),
                            crop_size=32)
        cfg = TrainConfig(model=ModelConfig(filters=(8, 16), act_fun="mish"),
                          optimizer="ranger", batch_size=4, max_epochs=20,
                          run_name="rng_model_01", compute_dtype="float32")
        trainer = Trainer(cfg, tmp_path)
        trainer.fit(data)
        sidecar = json.loads((tmp_path / "rng_model_01.json").read_text())
        assert sidecar["optimizer"] == "ranger"
        assert "trained_epochs" in sidecar
        assert sidecar["architecture"][0] == "DU"


class TestSnapshotFingerprint:
    def _data(self, rng):
        from microbeseg_tpu.training.data import SplitArrays, TrainingData

        images = rng.integers(0, 65535, (8, 16, 16, 1)).astype(np.float32)
        labels = {
            "border_label": rng.random((8, 16, 16, 1)).astype(np.float32),
            "cell_label": rng.random((8, 16, 16, 1)).astype(np.float32)}
        split = SplitArrays(images=images, labels=labels,
                            ids=[str(i) for i in range(8)])
        return TrainingData(train=split, val=split, crop_size=16)

    def test_mismatched_config_rejects_snapshot_with_message(
            self, tmp_path, rng):
        """Resuming with a different optimizer must NOT deserialize the
        snapshot into the (mismatched) opt_state template — it rejects with
        an explicit message and restarts (ADVICE r2)."""
        import dataclasses

        from microbeseg_tpu.config import ModelConfig, TrainConfig
        from microbeseg_tpu.training.trainer import Trainer

        data = self._data(rng)
        cfg = TrainConfig(model=ModelConfig(filters=(8, 16), act_fun="relu",
                                            normalization="gn"),
                          optimizer="adam", batch_size=4, max_epochs=20,
                          run_name="distance_model_01",
                          compute_dtype="float32", train_state_every=1)
        t_a = Trainer(cfg, tmp_path)
        msgs_a = []
        t_a.text_output = msgs_a.append
        t_a.should_stop = lambda: sum("Loss" in m for m in msgs_a) >= 2
        t_a.train(data)
        assert (tmp_path / "distance_model_01_state.train_state").is_file()

        cfg_b = dataclasses.replace(
            cfg, optimizer="ranger",
            model=dataclasses.replace(cfg.model, act_fun="mish"))
        t_b = Trainer(cfg_b, tmp_path)
        msgs_b = []
        t_b.text_output = msgs_b.append
        t_b.should_stop = lambda: any("Loss" in m for m in msgs_b)
        t_b.train(data, resume=True)
        assert any("rejected" in m and "optimizer" in m for m in msgs_b)
        assert not any("Resume training" in m for m in msgs_b)

    def test_matching_config_still_resumes(self, tmp_path, rng):
        from microbeseg_tpu.config import ModelConfig, TrainConfig
        from microbeseg_tpu.training.trainer import Trainer

        data = self._data(rng)
        cfg = TrainConfig(model=ModelConfig(filters=(8, 16), act_fun="relu",
                                            normalization="gn"),
                          optimizer="adam", batch_size=4, max_epochs=20,
                          run_name="distance_model_01",
                          compute_dtype="float32", train_state_every=1)
        t_a = Trainer(cfg, tmp_path)
        msgs_a = []
        t_a.text_output = msgs_a.append
        t_a.should_stop = lambda: sum("Loss" in m for m in msgs_a) >= 2
        t_a.train(data)

        t_b = Trainer(cfg, tmp_path)
        msgs_b = []
        t_b.text_output = msgs_b.append
        t_b.should_stop = lambda: any("Loss" in m for m in msgs_b)
        t_b.train(data, resume=True)
        assert any("Resume training from epoch 3" in m for m in msgs_b)
