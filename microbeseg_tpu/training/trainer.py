"""Training loop: sharded jit train step, reference training protocol.

Re-hosts the reference TrainWorker protocol (src/training/train.py:115-576)
on a TPU-native engine:

- one jitted train step = index gather -> on-device augmentation -> forward/
  backward in bfloat16 -> optimizer update, with the batch axis sharded over
  the 'data' mesh (psum grad all-reduce + synced BatchNorm come from XLA's
  partitioner; replaces nn.DataParallel, reference unets.py:51-52);
- weighted ragged-batch handling reproducing running_loss/len(dataset)
  normalization (reference :493-495);
- best-val checkpointing (:502-516), plateau break condition (:546-550),
  ReduceLROnPlateau / cosine schedules stepped per epoch on the host
  (:386-426, 529-533), loss-history artifact ``{run}_loss.txt`` (:558-569),
  Ranger second cosine-annealing run from the best checkpoint (:229-252),
  sidecar json with training_time/trained_epochs (utils.py:94-107).
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from microbeseg_tpu.config import TrainConfig, get_max_epochs, write_sidecar
from microbeseg_tpu.models.io import save_checkpoint
from microbeseg_tpu.models.unet import build_unet
from microbeseg_tpu.ops.augment import augment_batch, normalize_val
from microbeseg_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    pad_batch_to_devices,
    replicated_sharding,
)
from microbeseg_tpu.training.data import TrainingData, epoch_batches
from microbeseg_tpu.training.losses import get_batch_loss
from microbeseg_tpu.training.optimizers import build_optimizer, set_learning_rate
from microbeseg_tpu.training.schedules import CosineAnnealingLR, ReduceLROnPlateau


def _noop(*a, **k):
    pass


class Trainer:
    """Headless trainer; callbacks replace the reference's Qt signals."""

    def __init__(self, cfg: TrainConfig, path_models: Path,
                 text_output: Callable[[str], None] = _noop,
                 progress: Callable[[int], None] = _noop,
                 should_stop: Callable[[], bool] = lambda: False,
                 mesh=None):
        self.cfg = cfg
        self.path_models = Path(path_models)
        self.path_models.mkdir(parents=True, exist_ok=True)
        self.text_output = text_output
        self.progress = progress
        self.should_stop = should_stop
        self.mesh = mesh if mesh is not None else get_mesh(cfg.num_devices)
        self.model = build_unet(cfg.model,
                                dtype=jnp.dtype(cfg.compute_dtype))
        self.loss_fn = get_batch_loss(cfg.loss, cfg.label_type)
        self.stopped = False
        self._steps = None  # jitted (train_step, eval_step), built once

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def _build_steps(self, tx, has_batch_stats: bool):
        # One build per (optimizer, has_batch_stats): the Ranger fine-tune
        # phase's graph is IDENTICAL to the main run's (the lr lives in
        # opt_state via inject_hyperparams), but a fresh closure would force
        # a full retrace+recompile (~30-60 s on the tunnel backend) per
        # phase.  The key guards against a future caller passing a
        # structurally different tx and silently getting the memoized one.
        memo_key = (self.cfg.optimizer, has_batch_stats)
        if self._steps is not None and self._steps[0] == memo_key:
            return self._steps[1]
        model = self.model
        label_type = self.cfg.label_type
        batch_loss = self.loss_fn  # (pred, batch, weights) -> weighted sum

        bsh = batch_sharding(self.mesh)
        rsh = replicated_sharding(self.mesh)

        def apply_train(params, batch_stats, images, labels):
            variables = {"params": params}
            if has_batch_stats:
                variables["batch_stats"] = batch_stats
                preds, mutated = model.apply(variables, images, train=True,
                                             mutable=["batch_stats"])
                return preds, mutated["batch_stats"]
            preds = model.apply(variables, images, train=True)
            return preds, batch_stats

        def train_step(params, batch_stats, opt_state, images, labels,
                       weights, key):
            aug_img, aug_labels = augment_batch(key, images, labels,
                                                label_type)

            def losses(params):
                preds, new_bs = apply_train(params, batch_stats, aug_img,
                                            aug_labels)
                loss_sum = batch_loss(preds, aug_labels, weights)
                loss = loss_sum / jnp.maximum(jnp.sum(weights), 1.0)
                return loss, (new_bs, loss_sum)

            (_, (new_bs, loss_sum)), grads = jax.value_and_grad(
                losses, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_bs, new_opt, loss_sum

        def eval_step(params, batch_stats, images, labels, weights):
            images = normalize_val(images)
            variables = {"params": params}
            if has_batch_stats:
                variables["batch_stats"] = batch_stats
            preds = model.apply(variables, images, train=False)
            return batch_loss(preds, labels, weights)

        train_step = jax.jit(
            train_step,
            in_shardings=(rsh, rsh, rsh, bsh, bsh, bsh, rsh),
            out_shardings=(rsh, rsh, rsh, rsh),
            donate_argnums=(0, 1, 2))
        eval_step = jax.jit(
            eval_step,
            in_shardings=(rsh, rsh, bsh, bsh, bsh),
            out_shardings=rsh)
        self._steps = (memo_key, (train_step, eval_step))
        return self._steps[1]

    # ------------------------------------------------------------------
    # device residency
    # ------------------------------------------------------------------

    _DEVICE_CACHE_MAX_BYTES = 4 << 30  # huge trainsets stay host-resident

    def _device_cache(self, split):
        """(images, labels) as device arrays when the split fits comfortably
        in HBM — batch selection becomes an on-device row gather instead of
        a per-step host->device transfer; numpy passthrough otherwise.
        Memoized per split so the Ranger fine-tune phase reuses the main
        run's upload instead of re-shipping the trainset over the tunnel."""
        memo = getattr(self, "_dev_memo", None)
        if memo is None:
            memo = self._dev_memo = {}
        hit = memo.get(id(split))
        if hit is not None and hit[0] is split:
            return hit[1]
        nbytes = split.images.nbytes + sum(
            v.nbytes for v in split.labels.values())
        if nbytes > self._DEVICE_CACHE_MAX_BYTES:
            out = (split.images, split.labels)
        else:
            out = (jnp.asarray(split.images),
                   {k: jnp.asarray(v) for k, v in split.labels.items()})
        memo[id(split)] = (split, out)
        return out

    # ------------------------------------------------------------------
    # the reference train() protocol (train.py:316-576)
    # ------------------------------------------------------------------

    def train(self, data: TrainingData, best_loss: float = 1e4,
              print_output: bool = False, resume: bool = False,
              init_vars=None) -> float:
        cfg = self.cfg
        second_run = best_loss < 1e3
        max_epochs = cfg.max_epochs or get_max_epochs(len(data), data.crop_size)

        if second_run:
            self.text_output("Start 2nd run with cosine annealing")
        else:
            self.text_output("-" * 10)
            self.text_output(cfg.run_name)
            self.text_output("-" * 10)
            self.text_output(
                f"Train/validate on {len(data.train)}/{len(data.val)} images")

        tx, lr0 = build_optimizer(cfg, second_run=second_run)

        # schedules + break condition (reference :386-426)
        if cfg.optimizer == "adam":
            scheduler = ReduceLROnPlateau(lr0, factor=0.25,
                                          patience=max_epochs // 20,
                                          min_lr=3e-6)
            break_condition = 2 * max_epochs // 20 + 5
            run_epochs = max_epochs
        elif second_run:
            scheduler = CosineAnnealingLR(lr0, t_max=max_epochs // 10,
                                          eta_min=3e-5)
            break_condition = max_epochs // 10 + 1
            run_epochs = max_epochs // 10
        else:
            scheduler = ReduceLROnPlateau(lr0, factor=0.25,
                                          patience=max_epochs // 10,
                                          min_lr=0.075 * lr0)
            break_condition = 2 * max_epochs // 10 + 5
            run_epochs = max_epochs

        # init model + optimizer (both jitted: eager flax/optax init is
        # thousands of per-op dispatches — minutes over the device tunnel)
        rng = jax.random.PRNGKey(cfg.seed + (1 if second_run else 0))
        init_key, shuffle_seed = jax.random.split(rng)
        if init_vars is not None:
            # fine-tune / second-run warm start.  Fresh copies: these params
            # enter train_step's donation cycle, and the caller's snapshot
            # must stay valid
            p, bs = self._copy_vars(init_vars[0], init_vars[1])
            variables = {"params": p}
            if bs:
                variables["batch_stats"] = bs
        elif second_run:  # resume from the best checkpoint (reference :240-242)
            from microbeseg_tpu.models.io import (load_checkpoint,
                                                  variables_template)
            variables = load_checkpoint(
                variables_template(self.model,
                                   (data.crop_size, data.crop_size),
                                   ch_in=cfg.model.ch_in),
                self.path_models / f"{cfg.run_name}.ckpt")
        else:
            from microbeseg_tpu.models.io import init_variables
            sample = jnp.zeros((1, data.crop_size, data.crop_size,
                                cfg.model.ch_in), jnp.float32)
            variables = init_variables(self.model, init_key, sample)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        has_bs = "batch_stats" in variables
        opt_state = jax.jit(tx.init)(params)

        train_step, eval_step = self._build_steps(tx, has_bs)
        # 'bn': running stats drift from eval-input statistics under the
        # augmented train distribution, corrupting val losses and therefore
        # best-checkpoint selection; re-estimate exact stats on non-augmented
        # train images before EVERY validation phase (precise BN — costs one
        # forward pass over the train set per epoch, 'bn' only)
        stat_step = (self._make_stat_step(
            jax.tree.map(jnp.zeros_like, batch_stats)) if has_bs else None)

        np_rng = np.random.default_rng(cfg.seed + (1000 if second_run else 0))
        step_key = jax.random.PRNGKey(cfg.seed + (2 if second_run else 3))

        epochs_wo_improvement = 0
        train_hist, val_hist = [], []
        start_epoch = 0
        state_stem = self.path_models / f"{cfg.run_name}_state"
        if resume:
            from microbeseg_tpu.models.io import load_train_state, peek_train_state
            # fingerprint check BEFORE deserializing: a snapshot written under
            # a different optimizer/batch_size/filters/... would crash
            # serialization.from_bytes on the mismatched opt_state template
            # (or silently train a different schedule)
            host_meta = peek_train_state(state_stem)
            loaded = None
            if host_meta is not None:
                mismatched = self._snapshot_mismatch(host_meta)
                if mismatched:
                    self.text_output(
                        "Training snapshot found but rejected "
                        f"({', '.join(mismatched)} differ) — "
                        "starting from scratch")
                else:
                    template = {"params": jax.device_get(params),
                                "batch_stats": jax.device_get(batch_stats),
                                "opt_state": jax.device_get(opt_state),
                                "step_key": jax.device_get(step_key)}
                    loaded = load_train_state(template, state_stem)
            if loaded is not None and loaded[1].get("second_run") != second_run:
                self.text_output(
                    "Training snapshot belongs to the "
                    f"{'fine-tune' if loaded[1].get('second_run') else 'main'}"
                    " run — starting this phase from scratch")
            if loaded is not None and loaded[1].get("second_run") == second_run:
                arrays, host = loaded
                params = arrays["params"]
                batch_stats = arrays["batch_stats"]
                opt_state = arrays["opt_state"]
                step_key = jnp.asarray(arrays["step_key"])
                np_rng.bit_generator.state = host["np_rng"]
                for k, v in host["sched"].items():
                    setattr(scheduler, k, v)
                start_epoch = host["epoch"] + 1
                best_loss = host["best_loss"]
                epochs_wo_improvement = host["epochs_wo_improvement"]
                train_hist = list(host["train_hist"])
                val_hist = list(host["val_hist"])
                self.text_output(
                    f"Resume training from epoch {start_epoch + 1}")
            elif host_meta is None:
                self.text_output("No training snapshot found — "
                                 "starting from scratch")
        since = time.time()
        epoch = start_epoch - 1
        best_vars = None          # on-device snapshot of the best weights
        best_dirty = False        # snapshot newer than the disk checkpoint
        last_flush = time.time()

        def flush_best():
            # write the freshest best weights to disk (same bytes the old
            # per-improvement save produced, just less often)
            nonlocal best_dirty, last_flush
            if best_dirty:
                save_checkpoint(
                    {"params": best_vars[0], "batch_stats": best_vars[1]},
                    self.path_models / cfg.run_name)
                best_dirty = False
                last_flush = time.time()

        # Keep the whole trainset device-resident when it fits (batches are
        # then an on-device row gather instead of a per-step host->device
        # transfer over the slow link); numpy fallback for huge sets.
        train_imgs, train_labels = self._device_cache(data.train)
        val_imgs, val_labels = self._device_cache(data.val)

        # The per-step batch must be divisible by the mesh size; ragged /
        # rounded-up slots carry weight 0, so the weighted loss stays exact.
        n_dev = self.mesh.devices.size
        step_bs = pad_batch_to_devices(cfg.batch_size, n_dev)

        for epoch in range(start_epoch, run_epochs):
            if self.should_stop():
                self.text_output("Stop training due to user interaction.")
                try:
                    (self.path_models / f"{cfg.run_name}.ckpt").unlink()
                except FileNotFoundError:
                    pass
                self.stopped = True
                break

            # --- train phase ---
            # loss sums accumulate as device arrays; ONE host fetch per
            # epoch (a per-step float() would sync the ~25 ms dispatch
            # pipeline on every step)
            running = []
            for idx, w in epoch_batches(len(data.train), cfg.batch_size,
                                        np_rng, shuffle=True,
                                        step_size=step_bs):
                step_key, k = jax.random.split(step_key)
                images = train_imgs[idx]
                labels = {k2: v[idx] for k2, v in train_labels.items()}
                params, batch_stats, opt_state, loss_sum = train_step(
                    params, batch_stats, opt_state, images, labels, w, k)
                running.append(loss_sum)
            train_loss = float(jnp.sum(jnp.stack(running))) / len(data.train)
            train_hist.append(train_loss)

            if stat_step is not None:
                batch_stats = self._precise_stats(
                    stat_step, params, train_imgs, step_bs)

            # --- val phase ---
            running = []
            for idx, w in epoch_batches(len(data.val), cfg.batch_size,
                                        np_rng, shuffle=False,
                                        step_size=step_bs):
                images = val_imgs[idx]
                labels = {k2: v[idx] for k2, v in val_labels.items()}
                running.append(eval_step(params, batch_stats, images,
                                         labels, w))
            val_loss = float(jnp.sum(jnp.stack(running))) / len(data.val)
            val_hist.append(val_loss)

            if val_loss < best_loss:
                best_loss = val_loss
                msg = (f"{epoch + 1} / {run_epochs}: Loss train / val: "
                       f"{train_loss:.4f} / {val_loss:.4f} --> save")
                # snapshot best weights ON DEVICE (one jitted copy, ~ms);
                # fetching + writing the flagship's 186 MB to disk on every
                # improved epoch cost ~8 s/epoch over the ~22 MB/s tunnel —
                # the disk file is flushed below at most every _FLUSH_SECS
                # and always at the end of the run (same bytes either way)
                best_vars = self._copy_vars(params, batch_stats)
                best_dirty = True
                epochs_wo_improvement = 0
            else:
                msg = (f"{epoch + 1} / {run_epochs}: Loss train / val: "
                       f"{train_loss:.4f} / {val_loss:.4f}")
                epochs_wo_improvement += 1
            self.text_output(msg)
            if print_output:
                print(msg)

            # outside the improvement branch so staleness is bounded even
            # through a long plateau after an unflushed improvement
            if best_dirty and time.time() - last_flush > self._FLUSH_SECS:
                flush_best()

            new_lr = scheduler.step(val_loss)
            opt_state = set_learning_rate(opt_state, new_lr)

            if (cfg.train_state_every > 0
                    and (epoch + 1) % cfg.train_state_every == 0):
                from microbeseg_tpu.models.io import save_train_state
                # the snapshot records best_loss; the on-disk checkpoint
                # must hold the matching weights or a crash-resume would
                # never rewrite it (resumed val may never beat best_loss)
                flush_best()
                save_train_state(
                    {"params": params, "batch_stats": batch_stats,
                     "opt_state": opt_state, "step_key": step_key},
                    {"epoch": epoch, "best_loss": float(best_loss),
                     "epochs_wo_improvement": epochs_wo_improvement,
                     "train_hist": train_hist, "val_hist": val_hist,
                     "np_rng": np_rng.bit_generator.state,
                     "sched": {k: v for k, v in scheduler.__dict__.items()
                               if not k.startswith("_")},
                     "second_run": second_run,
                     "cfg": self._snapshot_fingerprint()},
                    state_stem)

            self.progress(int(100 * (epoch + 1) / run_epochs))

            # >= not ==: a resume under a different schedule could land
            # past the exact threshold and would otherwise never break
            if epochs_wo_improvement >= break_condition:
                self.text_output(
                    f"{epochs_wo_improvement} epochs without val loss "
                    "improvement --> break")
                break

        if not self.stopped:
            flush_best()
        # hand the freshest best weights to fit() so the Ranger second run
        # and recalibration reuse the device copy instead of re-uploading
        # the checkpoint file over the tunnel
        self._last_best_vars = best_vars if not self.stopped else None

        if not self.stopped and epoch >= 0:
            elapsed = time.time() - since
            self.text_output(
                f"Training completed in {elapsed // 60:.0f}min "
                f"{elapsed % 60:.0f}s")
            self._write_loss_history(train_hist, val_hist, second_run)
            self._timing = {"training_time": elapsed,
                            "trained_epochs": epoch + 1,
                            "second_run": second_run}
        return best_loss

    _FLUSH_SECS = 120.0  # max staleness of the on-disk best checkpoint

    def _copy_vars(self, params, batch_stats):
        """Non-aliasing device copies of (params, batch_stats) in ONE
        dispatch (a per-leaf eager jnp.copy would compile ~0.4 s per shape
        on first use over the tunnel).  Copies, not references: the live
        buffers are donated back into train_step on the next step."""
        fn = getattr(self, "_copy_vars_fn", None)
        if fn is None:
            fn = self._copy_vars_fn = jax.jit(
                lambda p, b: (jax.tree.map(jnp.copy, p),
                              jax.tree.map(jnp.copy, b)))
        return fn(params, batch_stats)

    # ------------------------------------------------------------------
    # BatchNorm statistic re-estimation ("precise BN")
    # ------------------------------------------------------------------

    def _make_stat_step(self, zero_bs):
        """Jitted per-batch raw-moment extractor: feeding zeroed running
        stats through flax's EMA returns (1 - momentum) * batch_stat, so the
        raw batch moments are recovered exactly by dividing out 0.1.
        Cached per Trainer (the graph only depends on the model)."""
        cached = getattr(self, "_stat_step_cache", None)
        if cached is not None:
            return cached
        model = self.model
        bsh = batch_sharding(self.mesh)
        rsh = replicated_sharding(self.mesh)

        def stat_step(params, images):
            _, mutated = model.apply(
                {"params": params, "batch_stats": zero_bs},
                normalize_val(images), train=True, mutable=["batch_stats"])
            return jax.tree.map(lambda s: s / (1.0 - 0.9),
                                mutated["batch_stats"])

        self._stat_step_cache = jax.jit(stat_step, in_shardings=(rsh, bsh),
                                        out_shardings=rsh)
        return self._stat_step_cache

    def _precise_stats(self, stat_step, params, images: np.ndarray,
                       step_bs: int):
        """Exact per-layer moments over ``images`` ("precise BN"): batch
        moments are pooled with mean* = E_b[mean_b] and
        var* = E_b[var_b] + Var_b[mean_b] (exact for equal-size batches; the
        ragged tail wraps around, a documented slight duplicate weighting)."""
        n = images.shape[0]
        order = np.arange(n)
        sum_mean = sum_msq = None
        n_batches = 0
        for start in range(0, n, step_bs):
            idx = np.resize(order[start:] if start + step_bs > n
                            else order[start:start + step_bs], step_bs)
            # host-side numpy accumulation: the stats are already fetched,
            # and per-leaf eager jnp ops would re-dispatch one tiny device
            # op per BatchNorm leaf per batch (CLAUDE.md: tiny eager
            # compiles are ~0.4 s each server-side and never persisted)
            stats = jax.device_get(stat_step(params, images[idx]))
            if sum_mean is None:
                sum_mean = jax.tree.map(np.zeros_like, stats)
                sum_msq = jax.tree.map(np.zeros_like, stats)
            sum_mean = jax.tree.map(np.add, sum_mean, stats)
            sum_msq = jax.tree.map(lambda acc, s: acc + s * s, sum_msq, stats)
            n_batches += 1

        def _combine(col_mean, col_msq):
            out = {}
            for layer, stats_m in col_mean.items():
                if isinstance(stats_m, dict) and "mean" in stats_m:
                    e_mean = stats_m["mean"] / n_batches
                    e_var = stats_m["var"] / n_batches
                    e_mean_sq = col_msq[layer]["mean"] / n_batches
                    out[layer] = {
                        "mean": e_mean,
                        "var": e_var + np.maximum(e_mean_sq - e_mean ** 2,
                                                  0.0),
                    }
                else:
                    out[layer] = _combine(stats_m, col_msq[layer])
            return out

        return _combine(sum_mean, sum_msq)

    def recalibrate_batch_stats(self, data: TrainingData,
                                variables=None) -> None:
        """Re-estimate BatchNorm running statistics over the train set and
        rewrite the best checkpoint (standalone entry point; during training
        the same pass runs every epoch before validation).  ``variables``:
        optional on-device (params, batch_stats) — skips re-uploading the
        checkpoint file over the tunnel when fit() already holds the best
        weights on device.

        The reference default 'bn' (src/training/train.py:187) trains on
        heavily augmented batches, so the EMA running stats drift far from
        the distribution eval-mode inputs actually have — predictions
        collapse at inference (docs/E2E_RESULTS.md round 1).  This pass feeds
        NON-augmented, eval-normalized train images through the net in train
        mode and replaces the running stats with the exact pooled moments.
        """
        from microbeseg_tpu.models.io import (load_checkpoint,
                                              save_checkpoint,
                                              variables_template)

        ckpt_path = self.path_models / f"{self.cfg.run_name}.ckpt"
        if variables is not None:
            params, bs = variables
            if not bs:
                return  # gn / in: nothing to recalibrate
        else:
            template = variables_template(self.model,
                                          (data.crop_size, data.crop_size),
                                          ch_in=self.cfg.model.ch_in)
            if "batch_stats" not in template or not template["batch_stats"]:
                return  # gn / in: nothing to recalibrate
            loaded = load_checkpoint(template, ckpt_path)
            params, bs = loaded["params"], loaded["batch_stats"]
        zero_bs = jax.tree.map(jnp.zeros_like, bs)
        stat_step = self._make_stat_step(zero_bs)
        n = len(data.train)
        step_bs = pad_batch_to_devices(min(self.cfg.batch_size, n),
                                       self.mesh.devices.size)
        new_bs = self._precise_stats(stat_step, params, data.train.images,
                                     step_bs)
        save_checkpoint({"params": params, "batch_stats": new_bs},
                        self.path_models / self.cfg.run_name)
        self.text_output(
            f"Recalibrated BatchNorm statistics over {n} train images")

    def _snapshot_fingerprint(self) -> dict:
        """Config fields that shape the opt_state template / schedule; a
        snapshot is only resumable when these all match."""
        cfg = self.cfg
        return {"optimizer": cfg.optimizer, "batch_size": cfg.batch_size,
                "filters": list(cfg.model.filters),
                "normalization": cfg.model.normalization,
                "label_type": cfg.label_type, "loss": cfg.loss,
                "unet_type": cfg.model.unet_type,
                "act_fun": cfg.model.act_fun,
                # max_epochs shapes break_condition and scheduler patience
                "max_epochs": cfg.max_epochs}

    def _snapshot_mismatch(self, host: dict) -> list:
        """Fingerprint keys on which the snapshot differs from this run's
        config (pre-fingerprint snapshots — no 'cfg' key — accept, matching
        the old behavior)."""
        saved = host.get("cfg")
        if saved is None:
            return []
        current = self._snapshot_fingerprint()
        return [k for k, v in current.items() if saved.get(k) != v]

    def _write_loss_history(self, train_hist, val_hist, second_run):
        stats = np.transpose(np.array(
            [list(range(1, len(train_hist) + 1)), train_hist, val_hist]))
        path = self.path_models / f"{self.cfg.run_name}_loss.txt"
        if second_run:
            with open(path, "a") as f:
                f.write("\n")
                np.savetxt(f, X=stats, fmt=["%3i", "%2.5f", "%2.5f"],
                           delimiter=",")
        else:
            np.savetxt(fname=str(path), X=stats,
                       fmt=["%3i", "%2.5f", "%2.5f"],
                       header="Epoch, training loss, validation loss",
                       delimiter=",")

    # ------------------------------------------------------------------
    # full protocol: main run (+ Ranger fine-tune), sidecar
    # ------------------------------------------------------------------

    def fit(self, data: TrainingData, print_output: bool = False,
            resume: bool = False, init_from: Optional[Path] = None) -> float:
        """Run the full two-phase schedule.  ``init_from`` warm-starts the
        first run from an existing checkpoint stem (fine-tuning — beyond
        reference, which always trains from scratch: train.py:206-228);
        ignored when ``resume`` latches onto a matching snapshot."""
        try:
            return self._fit(data, print_output, resume, init_from)
        finally:
            # drop pinned HBM even when train() raises (OOM ladder,
            # callback errors, transport failures) — a failed Trainer held
            # by a long-lived GUI session must not keep GB-scale trainset
            # copies and weight snapshots on device
            self._release_device_cache()

    def _fit(self, data: TrainingData, print_output: bool,
             resume: bool, init_from: Optional[Path] = None) -> float:
        import dataclasses
        if self.cfg.max_epochs is None:
            self.cfg = dataclasses.replace(
                self.cfg,
                max_epochs=get_max_epochs(len(data), data.crop_size))
        cfg = self.cfg

        # resume lands in whichever run the snapshot belongs to — unless the
        # snapshot's config fingerprint differs, in which case the whole
        # two-phase schedule restarts (train() would reject it anyway)
        resume_second = False
        host = None
        if resume:
            from microbeseg_tpu.models.io import peek_train_state
            host = peek_train_state(self.path_models / f"{cfg.run_name}_state")
            resume_second = bool(host and host.get("second_run")
                                 and not self._snapshot_mismatch(host))

        if resume_second:
            best = self.train(data, best_loss=host["best_loss"],
                              print_output=print_output, resume=True)
            extra: Dict = {}
            t2 = getattr(self, "_timing", {})
            if t2.get("second_run"):
                extra["training_time_run_2"] = t2.get("training_time")
                extra["trained_epochs_run2"] = t2.get("trained_epochs")
            if not self.stopped:
                self.recalibrate_batch_stats(
                    data, variables=getattr(self, "_last_best_vars", None))
                write_sidecar(cfg, self.path_models, extra=extra)
                self._drop_train_state()
            return best

        warm = None
        if init_from is not None and (not resume or host is None):
            from microbeseg_tpu.models.io import (load_checkpoint,
                                                  variables_template)
            v = load_checkpoint(
                variables_template(self.model,
                                   (data.crop_size, data.crop_size),
                                   ch_in=cfg.model.ch_in),
                Path(init_from).with_suffix(".ckpt"))
            warm = (v["params"], v.get("batch_stats", {}))
        best = self.train(data, print_output=print_output, resume=resume,
                          init_vars=warm)
        extra: Dict = dict(getattr(self, "_timing", {}))
        # the main run's best weights, still on device — the fine-tune phase
        # and recalibration reuse them instead of re-uploading the 186 MB
        # flagship checkpoint over the tunnel
        overall_vars = getattr(self, "_last_best_vars", None)
        if cfg.optimizer == "ranger" and not self.stopped:
            best = self.train(data, best_loss=best, print_output=print_output,
                              init_vars=overall_vars)
            t2 = getattr(self, "_timing", {})
            if t2.get("second_run"):
                extra["training_time_run_2"] = t2.get("training_time")
                extra["trained_epochs_run2"] = t2.get("trained_epochs")
            # run 2 may not improve on run 1's best — keep the newest
            overall_vars = getattr(self, "_last_best_vars", None) or overall_vars
        if not self.stopped:
            # 'bn' (the reference default): re-estimate running stats so
            # eval-mode inference sees calibrated statistics
            self.recalibrate_batch_stats(data, variables=overall_vars)
            write_sidecar(cfg, self.path_models, extra=extra)
            # a finished run needs no resumable snapshot — leaving it would
            # make a later --resume latch onto this completed run and
            # overwrite its checkpoint
            self._drop_train_state()
        return best

    def _release_device_cache(self) -> None:
        """Drop HBM pinned across the two-phase schedule (device-resident
        trainset copies + the best-weights snapshot) once fit() is done —
        a long-lived Trainer (GUI session) must not compete with later
        inference/eval jobs for device memory."""
        getattr(self, "_dev_memo", {}).clear()
        self._last_best_vars = None

    def _drop_train_state(self) -> None:
        stem = self.path_models / f"{self.cfg.run_name}_state"
        for suffix in (".train_state", ".train_state.json"):
            try:
                stem.with_suffix(suffix).unlink()
            except FileNotFoundError:
                pass
