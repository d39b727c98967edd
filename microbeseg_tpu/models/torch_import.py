"""Import reference PyTorch checkpoints into this framework.

The reference ships trained models as ``torch.save(net.state_dict())``
(.pth, src/training/train.py:502-515) plus a JSON sidecar
(src/utils/utils.py:94-107) — its Zenodo model zoo uses exactly this pair.
``convert_state_dict`` maps such a state_dict onto our Flax variable tree so
reference users can migrate trained models without retraining; the
``scripts/import_torch_model.py`` CLI wraps it end to end (.pth + .json in,
.ckpt + sidecar out).

Key correspondence (reference src/utils/unets.py module layout):

====================================  =================================
torch state_dict key                  flax variables path
====================================  =================================
encoderConv.{i}.conv.0.{weight,bias}  params/encoder/enc{i}/conv0
encoderConv.{i}.conv.2.*              .../enc{i}/norm0/<Norm>
encoderConv.{i}.conv.3.*              .../enc{i}/conv1
encoderConv.{i}.conv.5.*              .../enc{i}/norm1/<Norm>
pooling.{i}.conv_pool.0.*             params/encoder/pool{i}/conv
pooling.{i}.conv_pool.2.*             params/encoder/pool{i}/norm/<Norm>
decoder1Upconv.{i}.up.0.*             params/decoder1/up{i}/up
decoder1Upconv.{i}.norm.*             params/decoder1/up{i}/norm/<Norm>
decoder1Conv.{i}.conv.*               params/decoder1/dec{i}/...
decoder1Conv.{last}.{weight,bias}     params/decoder1/out
(decoder2* identically; UNet uses decoderUpconv/decoderConv -> decoder/)
====================================  =================================

where <Norm> is ``BatchNorm_0`` ('bn': weight->scale, bias->bias,
running_mean->batch_stats mean, running_var->var) or ``GroupNorm_0``
('gn': weight->scale, bias->bias); 'in' (torch InstanceNorm2d,
affine=False) has no parameters on either side.

Array layout transforms (NCHW torch -> NHWC flax):

- Conv2d weight (O, I, kH, kW)          -> kernel (kH, kW, I, O)
- ConvTranspose2d weight (I, O, kH, kW) -> kernel (kH, kW, I, O) with the
  spatial taps REVERSED: torch's transposed conv scatters W[i, o, dy, dx]
  patches, while flax's nn.ConvTranspose (lax.conv_transpose,
  transpose_kernel=False) runs a zero-inserted forward conv with the
  unflipped kernel — verified numerically in tests/test_torch_import.py.
- 1x1 output Conv2d (O, I, 1, 1)        -> kernel (1, 1, I, O)

A ``module.`` prefix (reference DataParallel checkpoints, unets.py:60-78)
is stripped; ``num_batches_tracked`` buffers are ignored.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from microbeseg_tpu.config import ModelConfig

_NORM_INNER = {"bn": "BatchNorm_0", "gn": "GroupNorm_0"}


def _conv(dst: Dict[str, Any], sd: Dict[str, np.ndarray], key: str) -> None:
    """Conv2d -> {kernel, bias} (OIHW -> HWIO)."""
    dst["kernel"] = np.ascontiguousarray(
        sd.pop(f"{key}.weight").transpose(2, 3, 1, 0)).astype(np.float32)
    dst["bias"] = sd.pop(f"{key}.bias").astype(np.float32)


def _conv_t(dst: Dict[str, Any], sd: Dict[str, np.ndarray], key: str) -> None:
    """ConvTranspose2d -> {kernel, bias} (IOHW -> HWIO, spatial reverse)."""
    w = sd.pop(f"{key}.weight").transpose(2, 3, 0, 1)[::-1, ::-1]
    dst["kernel"] = np.ascontiguousarray(w).astype(np.float32)
    dst["bias"] = sd.pop(f"{key}.bias").astype(np.float32)


def _norm(params: Dict[str, Any], stats: Optional[Dict[str, Any]],
          sd: Dict[str, np.ndarray], key: str, kind: str) -> None:
    """Norm layer -> params {scale, bias} (+ batch_stats {mean, var})."""
    if kind == "in":                    # torch InstanceNorm2d: affine=False
        return
    inner = _NORM_INNER[kind]
    params[inner] = {
        "scale": sd.pop(f"{key}.weight").astype(np.float32),
        "bias": sd.pop(f"{key}.bias").astype(np.float32),
    }
    if kind == "bn":
        assert stats is not None
        stats[inner] = {
            "mean": sd.pop(f"{key}.running_mean").astype(np.float32),
            "var": sd.pop(f"{key}.running_var").astype(np.float32),
        }
        sd.pop(f"{key}.num_batches_tracked", None)


def convert_state_dict(state_dict: Dict[str, Any],
                       cfg: ModelConfig) -> Dict[str, Any]:
    """Reference torch ``state_dict`` -> flax variables for ``build_unet(cfg)``.

    ``state_dict`` values may be torch tensors or numpy arrays.  Returns
    ``{'params': ..., 'batch_stats': ...}`` (batch_stats only for 'bn').
    Raises ``ValueError`` on leftover/missing keys so a mismatched
    architecture fails loudly instead of producing a silently-broken model.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):     # DataParallel wrap (unets.py:60-78)
            k = k[len("module."):]
        sd[k] = np.asarray(getattr(v, "detach", lambda: v)().cpu()
                           if hasattr(v, "detach") else v)

    kind = cfg.normalization
    depth = cfg.depth
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {} if kind == "bn" else None

    def node(tree, *names):
        for n in names:
            tree = tree.setdefault(n, {})
        return tree

    def conv_block(pfx_t, tree_p, tree_s):
        """ConvBlock: Sequential [conv, act, norm, conv, act, norm]."""
        _conv(node(tree_p, "conv0"), sd, f"{pfx_t}.conv.0")
        _norm(node(tree_p, "norm0"),
              node(tree_s, "norm0") if tree_s is not None else None,
              sd, f"{pfx_t}.conv.2", kind)
        _conv(node(tree_p, "conv1"), sd, f"{pfx_t}.conv.3")
        _norm(node(tree_p, "norm1"),
              node(tree_s, "norm1") if tree_s is not None else None,
              sd, f"{pfx_t}.conv.5", kind)

    # encoder
    enc_p = node(params, "encoder")
    enc_s = node(stats, "encoder") if stats is not None else None
    for i in range(depth):
        conv_block(f"encoderConv.{i}", node(enc_p, f"enc{i}"),
                   node(enc_s, f"enc{i}") if enc_s is not None else None)
        if cfg.pool_method == "conv" and i < depth - 1:
            _conv(node(enc_p, f"pool{i}", "conv"), sd,
                  f"pooling.{i}.conv_pool.0")
            _norm(node(enc_p, f"pool{i}", "norm"),
                  node(enc_s, f"pool{i}", "norm")
                  if enc_s is not None else None,
                  sd, f"pooling.{i}.conv_pool.2", kind)

    # decoder(s)
    heads = ([("decoder", "decoderUpconv", "decoderConv")]
             if cfg.unet_type == "U" else
             [("decoder1", "decoder1Upconv", "decoder1Conv"),
              ("decoder2", "decoder2Upconv", "decoder2Conv")])
    for ours, up_t, conv_t in heads:
        dec_p = node(params, ours)
        dec_s = node(stats, ours) if stats is not None else None
        for i in range(depth - 1):
            _conv_t(node(dec_p, f"up{i}", "up"), sd, f"{up_t}.{i}.up.0")
            _norm(node(dec_p, f"up{i}", "norm"),
                  node(dec_s, f"up{i}", "norm")
                  if dec_s is not None else None,
                  sd, f"{up_t}.{i}.norm", kind)
            conv_block(f"{conv_t}.{i}", node(dec_p, f"dec{i}"),
                       node(dec_s, f"dec{i}") if dec_s is not None else None)
        _conv(node(dec_p, "out"), sd, f"{conv_t}.{depth - 1}")

    if sd:
        raise ValueError(
            f"unconsumed torch keys (architecture mismatch?): "
            f"{sorted(sd)[:8]}{'...' if len(sd) > 8 else ''}")

    def prune(tree):
        """Drop empty subtrees ('in' norms carry no params on either side —
        flax omits the module key entirely, so must we)."""
        return {k: prune(v) if isinstance(v, dict) else v
                for k, v in tree.items()
                if not (isinstance(v, dict) and not prune(v))}

    variables: Dict[str, Any] = {"params": prune(params)}
    if stats is not None:
        variables["batch_stats"] = prune(stats)
    return variables


def export_state_dict(variables: Dict[str, Any],
                      cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Inverse of ``convert_state_dict``: flax variables -> a reference-
    format torch state_dict (numpy values; pass through torch.tensor for
    ``torch.save``).  Lets TPU-trained models run in the reference GPU tool.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    kind = cfg.normalization
    sd: Dict[str, np.ndarray] = {}

    def conv(key, tree):
        sd[f"{key}.weight"] = np.ascontiguousarray(
            np.asarray(tree["kernel"], np.float32).transpose(3, 2, 0, 1))
        sd[f"{key}.bias"] = np.asarray(tree["bias"], np.float32)

    def conv_t(key, tree):
        k = np.asarray(tree["kernel"], np.float32)[::-1, ::-1]
        sd[f"{key}.weight"] = np.ascontiguousarray(k.transpose(2, 3, 0, 1))
        sd[f"{key}.bias"] = np.asarray(tree["bias"], np.float32)

    def norm(key, tree_p, tree_s):
        if kind == "in":
            return
        inner = _NORM_INNER[kind]
        sd[f"{key}.weight"] = np.asarray(tree_p[inner]["scale"], np.float32)
        sd[f"{key}.bias"] = np.asarray(tree_p[inner]["bias"], np.float32)
        if kind == "bn":
            sd[f"{key}.running_mean"] = np.asarray(tree_s[inner]["mean"],
                                                   np.float32)
            sd[f"{key}.running_var"] = np.asarray(tree_s[inner]["var"],
                                                  np.float32)
            sd[f"{key}.num_batches_tracked"] = np.asarray(0, np.int64)

    def conv_block(key, tree_p, tree_s):
        conv(f"{key}.conv.0", tree_p["conv0"])
        norm(f"{key}.conv.2", tree_p.get("norm0", {}),
             (tree_s or {}).get("norm0"))
        conv(f"{key}.conv.3", tree_p["conv1"])
        norm(f"{key}.conv.5", tree_p.get("norm1", {}),
             (tree_s or {}).get("norm1"))

    enc_p, enc_s = params["encoder"], stats.get("encoder", {})
    for i in range(cfg.depth):
        conv_block(f"encoderConv.{i}", enc_p[f"enc{i}"],
                   enc_s.get(f"enc{i}"))
        if cfg.pool_method == "conv" and i < cfg.depth - 1:
            conv(f"pooling.{i}.conv_pool.0", enc_p[f"pool{i}"]["conv"])
            norm(f"pooling.{i}.conv_pool.2", enc_p[f"pool{i}"].get("norm", {}),
                 enc_s.get(f"pool{i}", {}).get("norm"))

    heads = ([("decoder", "decoderUpconv", "decoderConv")]
             if cfg.unet_type == "U" else
             [("decoder1", "decoder1Upconv", "decoder1Conv"),
              ("decoder2", "decoder2Upconv", "decoder2Conv")])
    for ours, up_t, conv_key in heads:
        dec_p, dec_s = params[ours], stats.get(ours, {})
        for i in range(cfg.depth - 1):
            conv_t(f"{up_t}.{i}.up.0", dec_p[f"up{i}"]["up"])
            norm(f"{up_t}.{i}.norm", dec_p[f"up{i}"].get("norm", {}),
                 dec_s.get(f"up{i}", {}).get("norm"))
            conv_block(f"{conv_key}.{i}", dec_p[f"dec{i}"],
                       dec_s.get(f"dec{i}"))
        conv(f"{conv_key}.{cfg.depth - 1}", dec_p["out"])
    return sd


def import_torch_checkpoint(pth_path: Path, out_dir: Path,
                            json_path: Optional[Path] = None,
                            label_type: Optional[str] = None) -> Path:
    """Convert a reference ``.pth`` + ``.json`` pair to our ``.ckpt`` +
    sidecar under ``out_dir`` (same stem).  Requires torch to unpickle.

    The reference sidecar (utils.py:94-107) provides the architecture tuple;
    ``label_type`` falls back to it.  Returns the .ckpt path.
    """
    import json

    import torch

    from microbeseg_tpu.config import TrainConfig
    from microbeseg_tpu.models.io import save_model, variables_template
    from microbeseg_tpu.models.unet import build_unet

    pth_path = Path(pth_path)
    json_path = Path(json_path) if json_path else pth_path.with_suffix(".json")
    sidecar = json.loads(json_path.read_text())
    label_type = label_type or sidecar.get("label_type", "distance")
    mcfg = ModelConfig.from_architecture(sidecar["architecture"],
                                         label_type=label_type)
    state_dict = torch.load(pth_path, map_location="cpu")
    variables = convert_state_dict(state_dict, mcfg)

    # structural check against the real model tree before persisting
    import jax
    template = variables_template(build_unet(mcfg), (64, 64),
                                  ch_in=mcfg.ch_in)
    t_paths = {jax.tree_util.keystr(p)
               for p, _ in jax.tree_util.tree_leaves_with_path(template)}
    v_paths = {jax.tree_util.keystr(p)
               for p, _ in jax.tree_util.tree_leaves_with_path(variables)}
    if t_paths != v_paths:
        raise ValueError(
            f"converted tree mismatch: missing {sorted(t_paths - v_paths)[:5]}"
            f" extra {sorted(v_paths - t_paths)[:5]}")

    cfg = TrainConfig(model=mcfg, label_type=label_type,
                      loss=sidecar.get("loss", "smooth_l1"),
                      optimizer=sidecar.get("optimizer", "ranger"),
                      batch_size=int(sidecar.get("batch_size", 4)),
                      run_name=pth_path.stem)
    return save_model(variables, cfg, Path(out_dir),
                      extra={"imported_from": str(pth_path)})


def export_torch_checkpoint(ckpt_path: Path, out_dir: Path) -> Path:
    """Convert one of our ``.ckpt`` + sidecar pairs into a reference
    ``.pth`` + ``.json`` pair under ``out_dir`` (same stem), so TPU-trained
    models run in the reference GPU tool.  Requires torch.  Returns the
    .pth path."""
    import json

    import torch

    from microbeseg_tpu.config import read_sidecar
    from microbeseg_tpu.models.io import load_model

    ckpt_path = Path(ckpt_path)
    _, variables, cfg = load_model(ckpt_path)
    sd = {k: torch.tensor(v)
          for k, v in export_state_dict(variables, cfg.model).items()}
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    stem = ckpt_path.stem if ckpt_path.suffix == ".ckpt" else ckpt_path.name
    pth = out_dir / f"{stem}.pth"
    torch.save(sd, pth)
    sidecar = read_sidecar(
        ckpt_path.with_suffix("").parent / f"{stem}.json")
    (out_dir / f"{stem}.json").write_text(json.dumps(sidecar, indent=2))
    return pth
