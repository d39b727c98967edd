"""Model tests: shapes, parameter counts, norm/act/pool variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microbeseg_tpu.config import ModelConfig
from microbeseg_tpu.models import build_unet, load_model, save_checkpoint
from microbeseg_tpu.models.io import load_checkpoint, save_model
from microbeseg_tpu.config import TrainConfig

SMALL = ModelConfig(filters=(8, 32))  # 3 levels, fast to init


def _init(model, size=32, ch_in=1):
    x = jnp.zeros((2, size, size, ch_in), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return variables, x


class TestDUNet:
    def test_output_shapes(self):
        model = build_unet(SMALL)
        variables, x = _init(model)
        border, cell = model.apply(variables, x, train=False)
        assert border.shape == (2, 32, 32, 1)
        assert cell.shape == (2, 32, 32, 1)
        assert border.dtype == jnp.float32

    def test_train_mode_updates_batch_stats(self):
        model = build_unet(SMALL)
        variables, x = _init(model)
        out, mutated = model.apply(variables, x, train=True,
                                   mutable=["batch_stats"])
        assert "batch_stats" in mutated

    @pytest.mark.parametrize("norm", ["gn", "in"])
    def test_norm_variants(self, norm):
        model = build_unet(ModelConfig(filters=(8, 16), normalization=norm))
        variables, x = _init(model)
        border, cell = model.apply(variables, x, train=False)
        assert border.shape == (2, 32, 32, 1)
        assert "batch_stats" not in variables

    @pytest.mark.parametrize("act", ["mish", "leakyrelu", "elu"])
    def test_act_variants(self, act):
        model = build_unet(ModelConfig(filters=(8, 16), act_fun=act))
        variables, x = _init(model)
        model.apply(variables, x, train=False)

    def test_max_pool_variant(self):
        model = build_unet(ModelConfig(filters=(8, 16), pool_method="max"))
        variables, x = _init(model)
        border, cell = model.apply(variables, x, train=False)
        assert cell.shape == (2, 32, 32, 1)


class TestInitHelpers:
    """init_variables / variables_template (models/io.py): the jitted init
    must produce the SAME values as eager flax init, and the eval_shape
    template the same tree/shapes/dtypes — both exist purely to kill
    per-op dispatch latency over the device tunnel."""

    def test_jit_init_matches_eager(self):
        from microbeseg_tpu.models.io import init_variables
        model = build_unet(SMALL)
        x = jnp.zeros((1, 32, 32, 1), jnp.float32)
        eager = model.init(jax.random.PRNGKey(3), x, train=False)
        jitted = init_variables(model, jax.random.PRNGKey(3), x)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            dict(eager), dict(jitted))

    def test_template_matches_init_structure(self):
        from microbeseg_tpu.models.io import variables_template
        for cfg in (SMALL, ModelConfig(filters=(8, 16), normalization="gn")):
            model = build_unet(cfg)
            x = jnp.zeros((1, 32, 32, 1), jnp.float32)
            real = jax.device_get(dict(
                model.init(jax.random.PRNGKey(0), x, train=False)))
            tpl = variables_template(model, (32, 32), ch_in=1)
            assert jax.tree.structure(tpl) == jax.tree.structure(real)

            def check(t, r):
                assert t.shape == r.shape, (t.shape, r.shape)
                assert t.dtype == r.dtype, (t.dtype, r.dtype)

            jax.tree.map(check, tpl, real)


class TestUNet:
    def test_boundary_output(self):
        model = build_unet(ModelConfig(unet_type="U", ch_out=3, filters=(8, 32)))
        variables, x = _init(model)
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, 32, 32, 3)


class TestParamCount:
    def test_full_dunet_param_count(self):
        """Parameter count of the flagship DUNet(64->1024) matches the torch
        reference architecture arithmetic (~same conv/bn shapes)."""
        model = build_unet(ModelConfig())
        x = jnp.zeros((1, 64, 64, 1), jnp.float32)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), x, train=False))
        n = sum(int(np.prod(v.shape))
                for v in jax.tree.leaves(variables["params"]))
        # Torch reference DUNet('conv','bn',(64,1024)): shared encoder
        # 18.84M + conv-pools 3.13M + 2 decoders x 12.19M + bn affine ≈ 46.4M.
        # Conv/convT/bn shapes are layout-transposes of ours, so counts match.
        assert n == 46_374_914, n

    def test_depth(self):
        assert ModelConfig().depth == 5
        assert ModelConfig(filters=(32, 256)).depth == 4


class TestCheckpointIO:
    def test_roundtrip(self, tmp_path):
        model = build_unet(SMALL)
        variables, x = _init(model)
        cfg = TrainConfig(model=SMALL, run_name="t_model_01", batch_size=2)
        save_model(dict(variables), cfg, tmp_path)
        model2, variables2, cfg2 = load_model(tmp_path / "t_model_01")
        assert cfg2.model.filters == (8, 32)
        out1 = model.apply(variables, x, train=False)
        out2 = model2.apply(variables2, x, train=False)
        np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]),
                                   rtol=1e-6)

    def test_template_mismatch_roundtrip(self, tmp_path):
        model = build_unet(SMALL)
        variables, _ = _init(model)
        p = save_checkpoint(dict(variables), tmp_path / "m")
        template = jax.device_get(dict(variables))
        back = load_checkpoint(template, p)
        leaves1 = jax.tree.leaves(jax.device_get(dict(variables)))
        leaves2 = jax.tree.leaves(back)
        for a, b in zip(leaves1, leaves2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestRematVariant:
    def test_remat_identical_forward_and_grads(self, rng):
        """ConvBlock-level rematerialization (build_unet remat_policy) is a
        pure memory/speed knob: forward outputs AND gradients must match the
        plain model bit-for-bit (same params, same inputs)."""
        import jax
        import jax.numpy as jnp

        from microbeseg_tpu.config import ModelConfig
        from microbeseg_tpu.models.unet import build_unet

        cfg = ModelConfig(filters=(8, 32), act_fun="mish",
                          normalization="gn")
        plain = build_unet(cfg, dtype=jnp.float32)
        remat = build_unet(cfg, dtype=jnp.float32,
                           remat_policy=jax.checkpoint_policies.dots_saveable)
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 1)).astype(np.float32))
        variables = plain.init(jax.random.PRNGKey(0), x, train=False)

        out_p = plain.apply(variables, x, train=False)
        out_r = remat.apply(variables, x, train=False)
        for a, b in zip(out_p, out_r):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        def loss(m, p):
            border, cell = m.apply({"params": p}, x, train=True)
            return jnp.mean(border ** 2) + jnp.mean(cell ** 2)

        g_p = jax.grad(lambda p: loss(plain, p))(variables["params"])
        g_r = jax.grad(lambda p: loss(remat, p))(variables["params"])
        for a, b in zip(jax.tree_util.tree_leaves(g_p),
                        jax.tree_util.tree_leaves(g_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)

    def test_matmul_up_matches_convtranspose(self, rng):
        """up_impl='matmul' (einsum + depth-to-space) must reproduce
        nn.ConvTranspose exactly: same param tree, same outputs — the 2x2
        kernel equals the stride so there is no tap overlap and the
        transposed conv IS a per-pixel linear map."""
        import jax
        import jax.numpy as jnp

        from microbeseg_tpu.config import ModelConfig
        from microbeseg_tpu.models.unet import build_unet

        cfg = ModelConfig(filters=(8, 32), act_fun="relu",
                          normalization="gn")
        conv = build_unet(cfg, dtype=jnp.float32)
        matmul = build_unet(cfg, dtype=jnp.float32, up_impl="matmul")
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 1)).astype(np.float32))
        variables = conv.init(jax.random.PRNGKey(3), x, train=False)
        # identical param trees -> checkpoints interchangeable
        v2 = matmul.init(jax.random.PRNGKey(3), x, train=False)
        assert (jax.tree_util.tree_structure(variables)
                == jax.tree_util.tree_structure(v2))

        out_c = conv.apply(variables, x, train=False)
        out_m = matmul.apply(variables, x, train=False)
        for a, b in zip(out_c, out_m):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


class TestFastMish:
    def test_matches_naive_mish(self, rng):
        """mish is computed with one exp via the algebraic identity
        tanh(log(1+u)) = u(u+2)/(u(u+2)+2); it must match the naive
        x*tanh(softplus(x)) chain (values AND grads) over the full range,
        including the large-x identity branch and extreme magnitudes."""
        import jax
        import jax.numpy as jnp
        from flax import linen as nn

        from microbeseg_tpu.models.blocks import mish

        def naive(x):
            return x * jnp.tanh(nn.softplus(x))

        x = jnp.asarray(np.concatenate([
            np.linspace(-60, 60, 20001),
            [-1e30, -88.0, -12.001, -11.999, 11.999, 12.001, 88.0, 1e30],
        ]).astype(np.float32))
        np.testing.assert_allclose(np.asarray(mish(x)), np.asarray(naive(x)),
                                   rtol=1e-5, atol=2e-6)
        ga = jax.vmap(jax.grad(mish))(x)
        gb = jax.vmap(jax.grad(naive))(x)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-4, atol=5e-6)

    def test_bf16_within_ulp(self, rng):
        """In the model's bfloat16 compute dtype the two formulas agree to
        bf16 resolution (a couple of ulp)."""
        import jax.numpy as jnp
        from flax import linen as nn

        from microbeseg_tpu.models.blocks import mish

        x = jnp.asarray(rng.standard_normal(65536).astype(np.float32) * 6
                        ).astype(jnp.bfloat16)
        a = mish(x).astype(jnp.float32)
        b = (x * jnp.tanh(nn.softplus(x))).astype(jnp.float32)
        denom = np.maximum(np.abs(np.asarray(b)), 1.0)
        assert float(np.max(np.abs(np.asarray(a - b)) / denom)) < 0.02


class TestQuantConv:
    def test_param_tree_and_quality(self, rng):
        """build_unet(quantize=True) swaps large-spatial convs to the int8
        path (blocks.QuantConv) with an IDENTICAL param tree (checkpoints
        interchangeable); eval outputs stay close to bf16 and train mode is
        bit-identical (quantize is inference-only)."""
        import jax
        import jax.numpy as jnp
        import jax.tree_util as tu

        from microbeseg_tpu.config import ModelConfig
        from microbeseg_tpu.models.unet import build_unet

        cfg = ModelConfig(filters=(8, 32), act_fun="mish",
                          normalization="gn")
        plain = build_unet(cfg)
        quant = build_unet(cfg, quantize=True)
        x = jnp.asarray(
            rng.standard_normal((2, 256, 256, 1)).astype(np.float32))
        v = plain.init(jax.random.PRNGKey(0), x, train=False)
        v2 = quant.init(jax.random.PRNGKey(0), x, train=False)
        assert tu.tree_structure(v) == tu.tree_structure(v2)

        a = plain.apply(v, x, train=False)
        b = quant.apply(v, x, train=False)
        for pa, pb in zip(a, b):
            pa, pb = np.asarray(pa), np.asarray(pb)
            rms = np.sqrt(np.mean(pa ** 2))
            assert np.sqrt(np.mean((pa - pb) ** 2)) < 0.08 * rms + 1e-3

        ta = plain.apply(v, x, train=True)
        tb = quant.apply(v, x, train=True)
        for pa, pb in zip(ta, tb):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    def test_calibrated_static_scales(self, rng):
        """One mutable=['quant'] apply records a positive per-layer |x| max;
        subsequent applies use the static scale (no per-sample reduction)
        and stay close to the dynamic-scale output."""
        import jax
        import jax.numpy as jnp
        import jax.tree_util as tu

        from microbeseg_tpu.config import ModelConfig
        from microbeseg_tpu.models.unet import build_unet

        cfg = ModelConfig(filters=(8, 32), act_fun="mish",
                          normalization="gn")
        quant = build_unet(cfg, quantize=True)
        x = jnp.asarray(
            rng.standard_normal((2, 256, 256, 1)).astype(np.float32))
        v = quant.init(jax.random.PRNGKey(0), x, train=False)

        out_dyn = quant.apply(v, x, train=False)
        _, upd = quant.apply(v, x, train=False, mutable=["quant"])
        amaxes = tu.tree_leaves(upd["quant"])
        assert amaxes and all(float(a) > 0 for a in amaxes)

        out_static = quant.apply({**v, **upd}, x, train=False)
        for pd, ps in zip(out_dyn, out_static):
            pd, ps = np.asarray(pd), np.asarray(ps)
            rms = max(np.sqrt(np.mean(pd ** 2)), 1e-6)
            assert np.sqrt(np.mean((pd - ps) ** 2)) < 0.05 * rms + 1e-3

    def test_engine_calibrates_once(self, rng, tmp_path):
        """InferConfig.quantize: the engine calibrates on the first segment()
        call (quant collection appears in variables) and reuses the static
        scales afterwards — repeated segmentation is deterministic."""
        import jax

        from microbeseg_tpu.config import InferConfig, ModelConfig
        from microbeseg_tpu.inference.engine import InferenceEngine
        from microbeseg_tpu.models.unet import build_unet

        cfg = ModelConfig(filters=(8, 32), act_fun="mish",
                          normalization="gn")
        model = build_unet(cfg)
        x = rng.standard_normal((3, 256, 256)).astype(np.float32)
        v = model.init(jax.random.PRNGKey(0), x[:1][..., None], train=False)
        eng = InferenceEngine(model, v, "distance",
                              cfg=InferConfig(quantize=True, batch_size=2))
        assert not eng._quant_calibrated
        m1 = eng.segment(x)
        assert eng._quant_calibrated and "quant" in eng.variables
        m2 = eng.segment(x)
        np.testing.assert_array_equal(m1, m2)

    def test_engine_calibrates_per_shape(self, rng):
        """Calibration is per padded shape: a second frame size triggers a
        fresh calibration pass (larger frames quantize more layers) and
        earlier per-layer maxima survive the merge."""
        import jax
        import jax.tree_util as tu

        from microbeseg_tpu.config import InferConfig, ModelConfig
        from microbeseg_tpu.inference.engine import InferenceEngine
        from microbeseg_tpu.models.unet import build_unet

        cfg = ModelConfig(filters=(8, 32), act_fun="mish",
                          normalization="gn")
        model = build_unet(cfg)
        v = model.init(jax.random.PRNGKey(0),
                       jax.numpy.zeros((1, 256, 256, 1)), train=False)
        eng = InferenceEngine(model, v, "distance",
                              cfg=InferConfig(quantize=True, batch_size=2))
        eng.segment(rng.standard_normal((2, 256, 256)).astype(np.float32))
        assert (256, 256) in eng._quant_shapes
        n_amax = len(tu.tree_leaves(eng.variables["quant"]))
        assert n_amax > 0
        eng.segment(rng.standard_normal((2, 128, 128)).astype(np.float32))
        assert (128, 128) in eng._quant_shapes
        # the 128^2 pass quantizes no layers but must not wipe the 256^2
        # calibration
        assert len(tu.tree_leaves(eng.variables["quant"])) == n_amax

    def test_engine_calibrates_tiled_path(self, rng):
        """quantize + sliding-window tiling: calibration runs on the tile
        batch before the tiled forward is built."""
        import jax

        from microbeseg_tpu.config import InferConfig, ModelConfig
        from microbeseg_tpu.inference.engine import InferenceEngine
        from microbeseg_tpu.models.unet import build_unet

        cfg = ModelConfig(filters=(8, 32), act_fun="mish",
                          normalization="gn")
        model = build_unet(cfg)
        x = rng.standard_normal((1, 384, 384)).astype(np.float32)
        v = model.init(jax.random.PRNGKey(0),
                       jax.numpy.zeros((1, 256, 256, 1)), train=False)
        eng = InferenceEngine(
            model, v, "distance",
            cfg=InferConfig(quantize=True, use_tiling=True, tile_size=256,
                            tile_overlap=64, batch_size=2))
        masks = eng.segment(x)
        assert masks.shape == (1, 384, 384)
        assert eng._quant_calibrated and "quant" in eng.variables

    def test_predicate_spares_small_and_deep(self):
        """The layer predicate quantizes only >=256^2 spatial with medium
        channel counts — ch_in=1 input convs, the 128^2 level (XLA int8
        0.81x, a net loss) and deep 512-ch levels stay bf16 (measured in
        scripts/bench_int8_conv.py)."""
        from microbeseg_tpu.models.blocks import _quantize_this

        assert _quantize_this(256, 256, 64, 64)
        assert _quantize_this(512, 512, 128, 128)      # large tile, level 0/1
        assert not _quantize_this(128, 128, 128, 128)  # XLA int8 is slower
        assert not _quantize_this(256, 256, 1, 64)     # input conv
        assert not _quantize_this(32, 32, 512, 512)    # deep level
        assert not _quantize_this(64, 64, 256, 256)    # below spatial cut
