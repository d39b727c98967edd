"""Torch-checkpoint import: numeric forward equivalence torch vs flax.

``_TorchDUNet``/``_TorchUNet`` below are test oracles: independent, compact
torch implementations that reproduce the reference's module layout and
state_dict KEY NAMES (src/utils/unets.py — encoderConv.{i}.conv.{j},
pooling.{i}.conv_pool.{j}, decoder{1,2}Upconv.{i}.up.0/.norm,
decoder{1,2}Conv.{i}, trailing 1x1 conv) so the converter consumes exactly
what a real reference .pth provides.  The assertions are end-to-end: a
randomly initialized torch model's eval-mode forward must match our Flax
model's forward (f32 compute) after ``convert_state_dict``, for every
architecture axis (U/DU, bn/gn/in, relu/mish, conv/max pooling).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from microbeseg_tpu.config import ModelConfig  # noqa: E402
from microbeseg_tpu.models.torch_import import convert_state_dict  # noqa: E402
from microbeseg_tpu.models.unet import build_unet  # noqa: E402


class _Mish(tnn.Module):
    def forward(self, x):
        return x * torch.tanh(tnn.functional.softplus(x))


def _act(name):
    return {"relu": tnn.ReLU, "mish": _Mish, "elu": tnn.ELU,
            "leakyrelu": tnn.LeakyReLU}[name]()


def _norm(kind, ch):
    return {"bn": lambda: tnn.BatchNorm2d(ch),
            "gn": lambda: tnn.GroupNorm(8, ch),
            "in": lambda: tnn.InstanceNorm2d(ch)}[kind]()


def _conv_block(ci, co, act, kind):
    return tnn.Sequential(
        tnn.Conv2d(ci, co, 3, padding=1), _act(act), _norm(kind, co),
        tnn.Conv2d(co, co, 3, padding=1), _act(act), _norm(kind, co))


class _Block(tnn.Module):
    """Holder matching the reference's ConvBlock attribute name ('conv')."""

    def __init__(self, ci, co, act, kind):
        super().__init__()
        self.conv = _conv_block(ci, co, act, kind)

    def forward(self, x):
        return self.conv(x)


class _Pool(tnn.Module):
    def __init__(self, ch, act, kind):
        super().__init__()
        self.conv_pool = tnn.Sequential(
            tnn.Conv2d(ch, ch, 3, stride=2, padding=1),
            _act(act), _norm(kind, ch))

    def forward(self, x):
        return self.conv_pool(x)


class _Up(tnn.Module):
    def __init__(self, ci, co, kind):
        super().__init__()
        self.up = tnn.Sequential(tnn.ConvTranspose2d(ci, co, 2, stride=2))
        self.norm = _norm(kind, co)

    def forward(self, x):
        return self.norm(self.up(x))


def _feats(filters):
    fs, f = [filters[0]], filters[0]
    while f < filters[1]:
        f *= 2
        fs.append(f)
    return fs


class _TorchDUNet(tnn.Module):
    def __init__(self, ch_in=1, ch_out=1, pool="conv", act="relu",
                 kind="bn", filters=(4, 16)):
        super().__init__()
        fs = _feats(filters)
        self.pool_method = pool
        self.encoderConv = tnn.ModuleList(
            [_Block(ch_in if i == 0 else fs[i - 1], f, act, kind)
             for i, f in enumerate(fs)])
        if pool == "conv":
            self.pooling = tnn.ModuleList(
                [_Pool(f, act, kind) for f in fs[:-1]])
        else:
            self.pooling = tnn.MaxPool2d(2, 2)
        for d in ("decoder1", "decoder2"):
            ups = tnn.ModuleList(
                [_Up(f, f // 2, kind) for f in reversed(fs[1:])])
            convs = tnn.ModuleList(
                [_Block(f, f // 2, act, kind) for f in reversed(fs[1:])])
            convs.append(tnn.Conv2d(fs[0], ch_out if d == "decoder1" else 1,
                                    1))
            setattr(self, f"{d}Upconv", ups)
            setattr(self, f"{d}Conv", convs)

    def _encode(self, x):
        skips = []
        for i, block in enumerate(self.encoderConv[:-1]):
            x = block(x)
            skips.append(x)
            x = (self.pooling(x) if self.pool_method == "max"
                 else self.pooling[i](x))
        return self.encoderConv[-1](x), list(reversed(skips))

    def _decode(self, x, skips, ups, convs):
        for i, (up, conv) in enumerate(zip(ups, convs[:-1])):
            x = up(x)
            x = torch.cat([x, skips[i]], 1)
            x = conv(x)
        return convs[-1](x)

    def forward(self, x):
        x, skips = self._encode(x)
        return (self._decode(x, skips, self.decoder1Upconv,
                             self.decoder1Conv),
                self._decode(x, skips, self.decoder2Upconv,
                             self.decoder2Conv))


class _TorchUNet(_TorchDUNet):
    def __init__(self, ch_in=1, ch_out=3, pool="conv", act="relu",
                 kind="bn", filters=(4, 16)):
        tnn.Module.__init__(self)
        fs = _feats(filters)
        self.pool_method = pool
        self.encoderConv = tnn.ModuleList(
            [_Block(ch_in if i == 0 else fs[i - 1], f, act, kind)
             for i, f in enumerate(fs)])
        if pool == "conv":
            self.pooling = tnn.ModuleList(
                [_Pool(f, act, kind) for f in fs[:-1]])
        else:
            self.pooling = tnn.MaxPool2d(2, 2)
        self.decoderUpconv = tnn.ModuleList(
            [_Up(f, f // 2, kind) for f in reversed(fs[1:])])
        self.decoderConv = tnn.ModuleList(
            [_Block(f, f // 2, act, kind) for f in reversed(fs[1:])])
        self.decoderConv.append(tnn.Conv2d(fs[0], ch_out, 1))

    def forward(self, x):
        x, skips = self._encode(x)
        return self._decode(x, skips, self.decoderUpconv, self.decoderConv)


def _randomize(model, rng):
    """Non-trivial weights AND running stats (fresh BN stats are 0/1 and
    would hide mean/var mapping bugs)."""
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.tensor(
                rng.standard_normal(tuple(p.shape)).astype(np.float32) * 0.3))
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.tensor(
                    rng.standard_normal(tuple(b.shape)).astype(np.float32)))
            elif name.endswith("running_var"):
                b.copy_(torch.tensor(
                    rng.uniform(0.5, 2.0, tuple(b.shape)).astype(np.float32)))


def _compare(torch_model, mcfg, rng, atol, n_out=2):
    import jax.numpy as jnp

    torch_model.eval()
    x = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.tensor(x))
    refs = [r.numpy() for r in (ref if n_out == 2 else (ref,))]

    variables = convert_state_dict(torch_model.state_dict(), mcfg)
    model = build_unet(mcfg, dtype=jnp.float32)
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      train=False)
    outs = [np.asarray(o).transpose(0, 3, 1, 2)
            for o in (out if n_out == 2 else (out,))]
    for r, o in zip(refs, outs):
        np.testing.assert_allclose(o, r, atol=atol, rtol=1e-4)


class TestTorchImport:
    @pytest.mark.parametrize("kind,act,pool", [
        ("bn", "relu", "conv"),
        ("gn", "mish", "conv"),
        ("in", "relu", "max"),
    ])
    def test_dunet_forward_equivalence(self, kind, act, pool):
        rng = np.random.default_rng(3)
        filters = (8, 32)  # gn needs channels divisible by 8 groups
        tm = _TorchDUNet(pool=pool, act=act, kind=kind, filters=filters)
        _randomize(tm, rng)
        mcfg = ModelConfig(unet_type="DU", act_fun=act, pool_method=pool,
                           normalization=kind, filters=filters)
        # mish: our one-exp algebraic form accumulates ~1e-3 f32 drift vs
        # torch's exp->softplus->tanh chain through 10 conv levels (values
        # are equal in f64; the relu cases match at 5e-4)
        _compare(tm, mcfg, rng, atol=2e-3 if act == "mish" else 5e-4)

    def test_unet_boundary_forward_equivalence(self):
        rng = np.random.default_rng(4)
        tm = _TorchUNet(ch_out=3, kind="bn", filters=(8, 32))
        _randomize(tm, rng)
        mcfg = ModelConfig(unet_type="U", ch_out=3, normalization="bn",
                           filters=(8, 32))
        _compare(tm, mcfg, rng, atol=5e-4, n_out=1)

    def test_dataparallel_prefix_and_mismatch(self):
        rng = np.random.default_rng(5)
        tm = _TorchDUNet(filters=(4, 8))
        _randomize(tm, rng)
        mcfg = ModelConfig(filters=(4, 8))
        sd = {f"module.{k}": v for k, v in tm.state_dict().items()}
        variables = convert_state_dict(sd, mcfg)
        assert "batch_stats" in variables
        # a deeper architecture must fail loudly, not silently drop keys
        with pytest.raises((ValueError, KeyError)):
            convert_state_dict(tm.state_dict(), ModelConfig(filters=(4, 16)))

    def test_import_cli_roundtrip(self, tmp_path):
        """.pth + reference-format .json -> .ckpt + sidecar, loadable by
        the standard engine path."""
        import json

        from microbeseg_tpu.models.io import load_model
        from microbeseg_tpu.models.torch_import import import_torch_checkpoint

        rng = np.random.default_rng(6)
        tm = _TorchDUNet(kind="gn", act="mish", filters=(8, 16))
        _randomize(tm, rng)
        torch.save(tm.state_dict(), tmp_path / "distance_model_01.pth")
        (tmp_path / "distance_model_01.json").write_text(json.dumps({
            "architecture": ["DU", "conv", "mish", "gn", [8, 16]],
            "batch_size": 8, "label_type": "distance", "loss": "smooth_l1",
            "num_gpus": 1, "optimizer": "ranger",
            "run_name": "distance_model_01",
        }))
        out = tmp_path / "models"
        ckpt = import_torch_checkpoint(tmp_path / "distance_model_01.pth",
                                       out)
        assert ckpt.exists()
        model, variables, cfg = load_model(ckpt)
        assert cfg.model.filters == (8, 16)
        assert cfg.model.act_fun == "mish"
        # loaded weights match the torch originals
        w = np.asarray(
            variables["params"]["encoder"]["enc0"]["conv0"]["kernel"])
        ref = tm.state_dict()["encoderConv.0.conv.0.weight"].numpy()
        np.testing.assert_allclose(w, ref.transpose(2, 3, 1, 0), atol=0)


class TestTorchExport:
    @pytest.mark.parametrize("kind", ["bn", "gn"])
    def test_roundtrip_exact(self, kind):
        """export(convert(sd)) reproduces the torch state_dict bit-exactly
        (and a torch model loads it and agrees with the flax forward)."""
        import jax.numpy as jnp

        from microbeseg_tpu.models.torch_import import export_state_dict

        rng = np.random.default_rng(7)
        tm = _TorchDUNet(kind=kind, filters=(8, 16))
        _randomize(tm, rng)
        mcfg = ModelConfig(normalization=kind, filters=(8, 16))
        variables = convert_state_dict(tm.state_dict(), mcfg)
        sd = export_state_dict(variables, mcfg)
        orig = {k: v.numpy() for k, v in tm.state_dict().items()}
        assert set(sd) == set(orig)
        for k in orig:
            np.testing.assert_array_equal(sd[k], orig[k], err_msg=k)

        # a fresh torch model loads the exported dict and matches flax
        tm2 = _TorchDUNet(kind=kind, filters=(8, 16))
        tm2.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})
        tm2.eval()
        x = rng.standard_normal((1, 1, 32, 32)).astype(np.float32)
        with torch.no_grad():
            ref = [r.numpy() for r in tm2(torch.tensor(x))]
        model = build_unet(mcfg, dtype=jnp.float32)
        out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          train=False)
        for r, o in zip(ref, out):
            np.testing.assert_allclose(
                np.asarray(o).transpose(0, 3, 1, 2), r, atol=5e-4, rtol=1e-4)

    def test_export_cli_roundtrip(self, tmp_path):
        """.ckpt -> .pth pair; re-import reproduces the checkpoint."""
        import jax

        from microbeseg_tpu.config import TrainConfig
        from microbeseg_tpu.models.io import load_model, save_model
        from microbeseg_tpu.models.torch_import import (
            export_torch_checkpoint, import_torch_checkpoint)

        mcfg = ModelConfig(normalization="gn", act_fun="mish",
                           filters=(8, 16))
        model = build_unet(mcfg)
        variables = model.init(jax.random.PRNGKey(1),
                               np.zeros((1, 32, 32, 1), np.float32),
                               train=False)
        cfg = TrainConfig(model=mcfg, run_name="distance_model_01")
        save_model(dict(variables), cfg, tmp_path / "models")

        pth = export_torch_checkpoint(
            tmp_path / "models" / "distance_model_01.ckpt",
            tmp_path / "exported")
        assert pth.exists() and pth.with_suffix(".json").exists()

        ckpt2 = import_torch_checkpoint(pth, tmp_path / "reimported")
        _, v2, cfg2 = load_model(ckpt2)
        assert cfg2.model.filters == (8, 16)
        a = jax.tree.leaves(jax.device_get(dict(variables)))
        b = jax.tree.leaves(v2)
        assert all(np.array_equal(x, y) for x, y in zip(a, b))
