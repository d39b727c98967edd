"""Checkpoint save/load: msgpack variables + JSON sidecar.

Replaces the reference's ``torch.save(state_dict)`` + JSON sidecar pair
(reference: src/training/train.py:502-515, src/utils/utils.py:94-107).
Checkpoints are DataParallel-free by construction (params are a replicated
pytree); the sidecar keeps the reference's key contract so models remain
discoverable the same way (reference: src/inference/infer.py:83-86).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from microbeseg_tpu.config import (
    ModelConfig,
    TrainConfig,
    read_sidecar,
    train_config_from_sidecar,
    write_sidecar,
)
from microbeseg_tpu.models.unet import build_unet

CKPT_SUFFIX = ".ckpt"


@partial(jax.jit, static_argnums=0)
def _jit_init(model, key, sample):
    return model.init(key, sample, train=False)


def init_variables(model, key: jax.Array, sample: jax.Array) -> Dict[str, Any]:
    """``model.init`` under jit.

    Eager flax init dispatches thousands of tiny ops individually; over the
    ~25 ms-latency device tunnel that costs minutes per model build (measured
    103 s for the demo-size DUNet).  One jitted executable makes it one
    dispatch; jit caching keys on the (hashable) module, so repeated builds
    of the same architecture retrace nothing."""
    return _jit_init(model, key, sample)


def variables_template(model, sample_shape: Tuple[int, ...],
                       ch_in: int = 1) -> Dict[str, Any]:
    """Variable tree with the right STRUCTURE but host-zeros leaves, for
    ``load_checkpoint`` targets.  ``jax.eval_shape`` traces ``model.init``
    without compiling or executing anything — zero device work, no compile
    (the previous eager init paid ~100 s of dispatch latency per checkpoint
    load on the tunnel backend just to produce values that were immediately
    overwritten)."""
    dummy = jax.ShapeDtypeStruct((1, *sample_shape, ch_in), jnp.float32)
    # the rng must be ABSTRACT too: a concrete key makes the tracer
    # constant-fold the entire init (every split/fold_in/initializer
    # executes eagerly on device — measured 11 s / ~800 dispatches)
    key = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    shapes = jax.eval_shape(partial(model.init, train=False), key, dummy)
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), dict(shapes))


def save_checkpoint(variables: Dict[str, Any], path: Path) -> Path:
    """Serialize model variables ({'params': ..., 'batch_stats': ...})."""
    path = Path(path)
    if path.suffix != CKPT_SUFFIX:
        path = path.with_suffix(CKPT_SUFFIX)
    # Pull to host before serializing.
    variables = jax.device_get(variables)
    path.write_bytes(serialization.to_bytes(variables))
    return path


def load_checkpoint(template: Dict[str, Any], path: Path) -> Dict[str, Any]:
    """Load variables into the structure of ``template``."""
    data = Path(path).read_bytes()
    return serialization.from_bytes(template, data)


TRAIN_STATE_SUFFIX = ".train_state"


def save_train_state(arrays: Dict[str, Any], host: Dict[str, Any],
                     stem: Path) -> Path:
    """Full mid-training snapshot (SURVEY §5.4: the reference has no
    mid-epoch/optimizer-state resume; here params + batch_stats + optimizer
    state + RNG streams + scheduler/loop counters checkpoint together so an
    interrupted run continues EXACTLY where it left off).

    ``arrays``: pytree of device arrays (params, batch_stats, opt_state,
    step_key) — msgpack like the model checkpoints.  ``host``: JSON-able loop
    state (epoch, histories, numpy bit-generator state, scheduler fields).
    """
    import json

    stem = Path(stem)
    path = stem.with_suffix(TRAIN_STATE_SUFFIX)
    path.write_bytes(serialization.to_bytes(jax.device_get(arrays)))
    stem.with_suffix(TRAIN_STATE_SUFFIX + ".json").write_text(
        json.dumps(host))
    return path


def load_train_state(template_arrays: Dict[str, Any],
                     stem: Path) -> Optional[Tuple[Dict[str, Any],
                                                   Dict[str, Any]]]:
    """Restore a ``save_train_state`` snapshot into the template's tree
    structure; None if no snapshot exists."""
    import json

    stem = Path(stem)
    path = stem.with_suffix(TRAIN_STATE_SUFFIX)
    meta = stem.with_suffix(TRAIN_STATE_SUFFIX + ".json")
    if not (path.is_file() and meta.is_file()):
        return None
    arrays = serialization.from_bytes(template_arrays, path.read_bytes())
    return arrays, json.loads(meta.read_text())


def peek_train_state(stem: Path) -> Optional[Dict[str, Any]]:
    """Host metadata of a snapshot without touching the array payload."""
    import json

    meta = Path(stem).with_suffix(TRAIN_STATE_SUFFIX + ".json")
    return json.loads(meta.read_text()) if meta.is_file() else None


def save_model(variables: Dict[str, Any], cfg: TrainConfig, path_models: Path,
               extra: Optional[dict] = None) -> Path:
    """Save checkpoint + sidecar under ``path_models / run_name``."""
    path_models = Path(path_models)
    path_models.mkdir(parents=True, exist_ok=True)
    ckpt = save_checkpoint(variables, path_models / cfg.run_name)
    write_sidecar(cfg, path_models, extra=extra)
    return ckpt


def load_model(model_path: Path,
               dtype: jnp.dtype = jnp.bfloat16,
               input_size: int = 64) -> Tuple[Any, Dict[str, Any], TrainConfig]:
    """Load (model, variables, train_config) from a checkpoint path.

    ``model_path`` may point at the ``.ckpt`` or be the stem; the JSON sidecar
    must sit next to it (same contract as the reference's .pth + .json pair).
    """
    model_path = Path(model_path)
    if model_path.suffix == CKPT_SUFFIX:
        stem = model_path.with_suffix("")
    else:
        stem = model_path
    sidecar = read_sidecar(stem.parent / f"{stem.name}.json")
    cfg = train_config_from_sidecar(sidecar)
    model = build_unet(cfg.model, dtype=dtype)
    # Structure-only template: no device work, no compile.
    template = variables_template(model, (input_size, input_size),
                                  ch_in=cfg.model.ch_in)
    variables = load_checkpoint(template, stem.with_suffix(CKPT_SUFFIX))
    return model, variables, cfg
