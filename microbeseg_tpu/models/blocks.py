"""Building blocks of the (D)U-Net, NHWC layout.

Semantics follow reference src/utils/unets.py (ConvBlock :92-173,
ConvPool :176-226, TranspConvBlock :229-264, Mish :81-89) but the
implementation is TPU-idiomatic Flax: channels-last so XLA tiles convs onto
the MXU, configurable compute dtype (bfloat16 by default) with float32 params,
and BatchNorm that syncs across the data-parallel mesh automatically under
sharded jit (the global batch mean is computed through XLA collectives).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@jax.custom_jvp
def mish(x):
    """mish(x) = x * tanh(softplus(x)), computed with ONE transcendental.

    With u = e^x:  tanh(log(1 + u)) = ((1+u)^2 - 1) / ((1+u)^2 + 1)
                                    = u(u+2) / (u(u+2) + 2)
    so the naive chain exp -> log1p -> tanh (3 transcendental VPU ops per
    element, ~0.5 ms/crop of the flagship train step) collapses to one exp
    plus rational arithmetic.  u(u+2) overflows the compute dtype for large
    x where mish(x) = x to machine precision anyway, so the formula is
    evaluated at min(x, 12) and the identity branch selected above.
    """
    t = _tanh_sp(x)
    return x * t


def _tanh_sp(x):
    u = jnp.exp(jnp.minimum(x, jnp.asarray(12.0, x.dtype)))
    v = u * (u + 2.0)
    return jnp.where(x > 12.0, jnp.asarray(1.0, x.dtype), v / (v + 2.0))


@mish.defjvp
def _mish_jvp(primals, tangents):
    # d/dx mish = t + x * (1 - t^2) * sigmoid(x), t = tanh(softplus(x));
    # sigmoid reuses the same guarded exp (sigmoid(x) = u / (1 + u))
    (x,), (dx,) = primals, tangents
    u = jnp.exp(jnp.minimum(x, jnp.asarray(12.0, x.dtype)))
    v = u * (u + 2.0)
    t = jnp.where(x > 12.0, jnp.asarray(1.0, x.dtype), v / (v + 2.0))
    sig = u / (1.0 + u)
    return x * t, (t + x * (1.0 - t * t) * sig) * dx


_ACTS: dict = {
    "relu": nn.relu,
    "leakyrelu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
    "elu": nn.elu,
    "mish": mish,
    # identity: not a reference option — perf-diagnostic knob used to
    # isolate activation cost in scripts/profile_backward.py
    "linear": lambda x: x,
}


def get_act(name: str) -> Callable:
    try:
        return _ACTS[name]
    except KeyError:
        raise ValueError(f"Unsupported activation function: {name}") from None


class Norm(nn.Module):
    """Normalization switch: 'bn' | 'gn' (8 groups) | 'in' (instance)."""

    kind: str
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: Optional[str] = None   # set when running under pmap/shard_map

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "bn":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=jnp.float32,
                axis_name=self.axis_name,
            )(x)
        if self.kind == "gn":
            # epsilon 1e-5 = torch GroupNorm default (the reference's
            # runtime, unets.py:129-130); flax defaults to 1e-6
            return nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype,
                                param_dtype=jnp.float32)(x)
        if self.kind == "none":
            # not a reference option — perf-diagnostic knob (see _ACTS)
            return x
        if self.kind == "in":
            # InstanceNorm == GroupNorm with one channel per group, no affine
            # params (torch InstanceNorm2d default: affine=False).
            return nn.GroupNorm(num_groups=None, group_size=1,
                                use_bias=False, use_scale=False,
                                epsilon=1e-5, dtype=self.dtype)(x)
        raise ValueError(f"Unsupported normalization: {self.kind}")


def _quantize_this(h: int, w: int, c_in: int, c_out: int) -> bool:
    """Layer predicate for int8 inference: quantize only the >=256^2
    spatial, small/medium-channel conv3x3 layers where XLA's int8 conv
    measures 1.5-1.8x over bf16 on v5e (scripts/bench_int8_conv.py:
    256^2 64ch 1.51x, 256^2 128ch 1.82x).  128^2 x 128ch measured 0.81x
    (a net LOSS) and deep levels 0.6x, so they stay bf16, as do the
    ch_in=1 input conv and all 1x1/strided/transposed convs."""
    return h * w >= 256 * 256 and 8 <= c_in <= 256 and c_out <= 256


class QuantConv(nn.Module):
    """int8 3x3 conv for inference: drop-in for nn.Conv (IDENTICAL param
    tree — float32 'kernel' (3,3,ci,co) + 'bias' (co,), so checkpoints are
    interchangeable with the bf16 path).

    Weights quantize per-output-channel symmetric (computed from the f32
    params inside the jit — negligible vs the conv); the conv accumulates
    in int32 on the MXU's double-rate int8 path and dequantizes straight to
    the compute dtype.  Inference-only: no custom backward (training stays
    bf16).

    Activation scales come in two modes:
    - CALIBRATED (the fast path): a per-layer |x| max lives in the 'quant'
      variable collection, recorded by one apply with mutable=['quant'] on
      a representative batch (InferenceEngine does this on the first real
      chunk).  The quantize is then pure elementwise — XLA fuses it into
      the producing norm/act chain — and the dequant fuses into the conv
      consumer; no extra HBM passes.
    - DYNAMIC (fallback when no calibration has run): per-sample |x| max
      computed on the fly.  Correct, but the amax reduction is a separate
      full pass over the activation that breaks producer fusion — measured
      to eat the entire MXU saving (docs/E2E_RESULTS.md int8 probe).
    """

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c_in, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        # per-output-channel weight scales
        w_amax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
        w_scale = jnp.maximum(w_amax, 1e-12) / 127.0
        w_q = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(jnp.int8)

        xf = x.astype(jnp.float32)
        # is_initializing: init() makes every collection mutable — don't
        # create calibration vars there, or the init tree diverges from the
        # bf16 model's (checkpoint interchangeability)
        calibrating = (self.is_mutable_collection("quant")
                       and not self.is_initializing())
        if calibrating:
            # record the batch |x| max (monotone across calibration passes)
            amax_var = self.variable("quant", "act_amax",
                                     lambda: jnp.zeros((), jnp.float32))
            amax_var.value = jnp.maximum(amax_var.value,
                                         jnp.max(jnp.abs(xf)))
        if not calibrating and self.has_variable("quant", "act_amax"):
            # static per-tensor scale: quantize is elementwise (fusible);
            # out-of-range activations saturate at +/-127 via the clip
            x_scale = jnp.maximum(
                self.get_variable("quant", "act_amax"), 1e-12) / 127.0
        else:
            # dynamic per-sample scale (calibration pass itself, or no
            # calibration available)
            x_amax = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)
            x_scale = jnp.maximum(x_amax, 1e-12) / 127.0
        x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            x_q, w_q, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        scale = (x_scale * w_scale).astype(jnp.float32)
        return (y.astype(jnp.float32) * scale
                + bias).astype(self.dtype)


class ConvBlock(nn.Module):
    """[conv3x3 -> act -> norm] x 2."""

    features: int
    act_fun: str = "relu"
    normalization: str = "bn"
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: Optional[str] = None
    quantize: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_act(self.act_fun)
        for i in range(2):
            h, w, ci = x.shape[1], x.shape[2], x.shape[3]
            if (self.quantize and not train
                    and _quantize_this(h, w, ci, self.features)):
                x = QuantConv(self.features, self.dtype,
                              name=f"conv{i}")(x)
            else:
                x = nn.Conv(self.features, kernel_size=(3, 3),
                            strides=(1, 1),
                            padding=((1, 1), (1, 1)), use_bias=True,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv{i}")(x)
            x = act(x)
            x = Norm(self.normalization, dtype=self.dtype,
                     axis_name=self.axis_name, name=f"norm{i}")(x, train=train)
        return x


class ConvPool(nn.Module):
    """Strided-conv downsample: conv3x3 stride 2 -> act -> norm."""

    features: int
    act_fun: str = "relu"
    normalization: str = "bn"
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, kernel_size=(3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        x = get_act(self.act_fun)(x)
        x = Norm(self.normalization, dtype=self.dtype,
                 axis_name=self.axis_name, name="norm")(x, train=train)
        return x


class _MatmulUp(nn.Module):
    """2x2-stride-2 transposed conv as one matmul + depth-to-space.

    With kernel == stride there is no tap overlap, so
    ``out[2y+i, 2x+j, f] = sum_c x[y, x, c] * W[i, j, c, f] + b[f]`` —
    a per-pixel linear map.  Writing it as a single (B*H*W, C) x (C, 4F)
    einsum keeps BOTH the forward and the backward on clean MXU matmul
    shapes; XLA's strided transposed-conv backward kernels run well below
    matmul efficiency (measured in scripts/profile_backward.py).  The param
    tree ({kernel (2,2,C,F), bias (F,)}) matches nn.ConvTranspose exactly,
    so checkpoints are interchangeable between the two implementations.
    """

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, c_in, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        # lax.conv_transpose (transpose_kernel=False) places W[1-i, 1-j] at
        # output offset (i, j) — flip the taps to match ConvTranspose exactly
        z = jnp.einsum("bhwc,ijcf->bhiwjf", x.astype(self.dtype),
                       kernel[::-1, ::-1].astype(self.dtype))
        b, h, _, w, _, f = z.shape
        return z.reshape(b, 2 * h, 2 * w, f) + bias.astype(self.dtype)


class TranspConvBlock(nn.Module):
    """Upsample: transposed conv 2x2 stride 2 -> norm.

    ``up_impl``: 'conv' = nn.ConvTranspose; 'matmul' = the numerically
    equivalent einsum + depth-to-space (same param tree, faster backward)."""

    features: int
    normalization: str = "bn"
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: Optional[str] = None
    up_impl: str = "conv"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.up_impl == "matmul":
            x = _MatmulUp(self.features, self.dtype, name="up")(x)
        else:
            x = nn.ConvTranspose(self.features, kernel_size=(2, 2),
                                 strides=(2, 2),
                                 padding="VALID", use_bias=True,
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name="up")(x)
        x = Norm(self.normalization, dtype=self.dtype,
                 axis_name=self.axis_name, name="norm")(x, train=train)
        return x


def max_pool_2x2(x):
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
