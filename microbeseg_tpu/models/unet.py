"""U-Net architectures: single-decoder UNet and dual-decoder DUNet.

Behavioral parity with reference src/utils/unets.py (UNet :267-377,
DUNet :380-506): encoder filters doubling f0 -> f1 (default 64 -> 1024, five
levels), strided-conv or max pooling between levels, transposed-conv
upsampling, skip concatenation, 1x1 output convs.  DUNet shares the encoder
between two decoders: decoder 1 regresses the neighbor/border distance,
decoder 2 the cell distance (reference: unets.py:436-461).

TPU-native differences: NHWC layout, bfloat16 compute with float32 params,
float32 outputs, functional Flax modules (no DataParallel wrapping — data
parallelism is a sharding of the batch axis, see microbeseg_tpu.parallel).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from microbeseg_tpu.config import ModelConfig
from microbeseg_tpu.models.blocks import (
    ConvBlock,
    ConvPool,
    TranspConvBlock,
    max_pool_2x2,
)


def _level_features(filters: Tuple[int, int]) -> List[int]:
    feats = [filters[0]]
    while feats[-1] < filters[1]:
        feats.append(feats[-1] * 2)
    return feats


def _maybe_remat(cls, policy):
    """Block-level rematerialization: with a jax.checkpoint policy set, the
    block's intermediate activations are recomputed in the backward pass
    instead of stored — trades FLOPs for HBM traffic (train-step knob;
    argument 2 of __call__ is the static ``train`` flag)."""
    if policy is None:
        return cls
    return nn.remat(cls, policy=policy, static_argnums=(2,))


class _Encoder(nn.Module):
    filters: Tuple[int, int]
    act_fun: str
    pool_method: str
    normalization: str
    dtype: jnp.dtype
    axis_name: Optional[str] = None
    remat_policy: Optional[Any] = None
    quantize: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        CB = _maybe_remat(ConvBlock, self.remat_policy)
        feats = _level_features(self.filters)
        skips = []
        for i, f in enumerate(feats[:-1]):
            x = CB(f, self.act_fun, self.normalization, self.dtype,
                   self.axis_name, self.quantize, name=f"enc{i}")(x, train)
            skips.append(x)
            if self.pool_method == "conv":
                x = ConvPool(f, self.act_fun, self.normalization, self.dtype,
                             self.axis_name, name=f"pool{i}")(x, train=train)
            else:
                x = max_pool_2x2(x)
        x = CB(feats[-1], self.act_fun, self.normalization, self.dtype,
               self.axis_name, self.quantize,
               name=f"enc{len(feats) - 1}")(x, train)
        return x, skips


class _Decoder(nn.Module):
    filters: Tuple[int, int]
    ch_out: int
    act_fun: str
    normalization: str
    dtype: jnp.dtype
    axis_name: Optional[str] = None
    remat_policy: Optional[Any] = None
    up_impl: str = "conv"
    quantize: bool = False

    @nn.compact
    def __call__(self, x, skips, train: bool = False):
        CB = _maybe_remat(ConvBlock, self.remat_policy)
        feats = _level_features(self.filters)
        for i, f in enumerate(reversed(feats[:-1])):
            x = TranspConvBlock(f, self.normalization, self.dtype,
                                self.axis_name, self.up_impl,
                                name=f"up{i}")(x, train=train)
            x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)
            x = CB(f, self.act_fun, self.normalization, self.dtype,
                   self.axis_name, self.quantize, name=f"dec{i}")(x, train)
        x = nn.Conv(self.ch_out, kernel_size=(1, 1), use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32, name="out")(x)
        return x.astype(jnp.float32)


class UNet(nn.Module):
    """Single-decoder U-Net; ch_out=3 for the 3-class boundary method."""

    ch_in: int = 1
    ch_out: int = 3
    pool_method: str = "conv"
    act_fun: str = "relu"
    normalization: str = "bn"
    filters: Tuple[int, int] = (64, 1024)
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: Optional[str] = None
    remat_policy: Optional[Any] = None
    up_impl: str = "conv"
    quantize: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x, skips = _Encoder(self.filters, self.act_fun, self.pool_method,
                            self.normalization, self.dtype, self.axis_name,
                            self.remat_policy, self.quantize,
                            name="encoder")(x, train=train)
        return _Decoder(self.filters, self.ch_out, self.act_fun,
                        self.normalization, self.dtype, self.axis_name,
                        self.remat_policy, self.up_impl, self.quantize,
                        name="decoder")(x, skips, train=train)


class DUNet(nn.Module):
    """Shared-encoder, dual-decoder U-Net for the distance method.

    Returns (border_pred, cell_pred), each (B, H, W, 1) float32 — decoder 1 is
    the neighbor-distance head, decoder 2 the cell-distance head
    (reference: src/utils/unets.py:463-506).
    """

    ch_in: int = 1
    ch_out: int = 1
    pool_method: str = "conv"
    act_fun: str = "relu"
    normalization: str = "bn"
    filters: Tuple[int, int] = (64, 1024)
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: Optional[str] = None
    remat_policy: Optional[Any] = None
    up_impl: str = "conv"
    quantize: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x, skips = _Encoder(self.filters, self.act_fun, self.pool_method,
                            self.normalization, self.dtype, self.axis_name,
                            self.remat_policy, self.quantize,
                            name="encoder")(x, train=train)
        border = _Decoder(self.filters, self.ch_out, self.act_fun,
                          self.normalization, self.dtype, self.axis_name,
                          self.remat_policy, self.up_impl, self.quantize,
                          name="decoder1")(x, skips, train=train)
        cell = _Decoder(self.filters, 1, self.act_fun,
                        self.normalization, self.dtype, self.axis_name,
                        self.remat_policy, self.up_impl, self.quantize,
                        name="decoder2")(x, skips, train=train)
        return border, cell


def build_unet(cfg: ModelConfig, dtype: jnp.dtype = jnp.bfloat16,
               axis_name: Optional[str] = None, remat_policy=None,
               up_impl: str = "conv", quantize: bool = False):
    """Model factory (reference: src/utils/unets.py:8-57).

    ``remat_policy``: optional jax.checkpoint policy for ConvBlock-level
    rematerialization (identical numerics; train-step memory/speed knob).
    ``up_impl``: 'conv' | 'matmul' — implementation of the 2x2-stride-2
    upsampling (same param tree and numerics; see blocks._MatmulUp).
    ``quantize``: int8 inference on the large-spatial conv3x3 layers
    (same param tree — checkpoints interchangeable; eval-mode only; see
    blocks.QuantConv)."""
    cls = DUNet if cfg.unet_type == "DU" else UNet
    return cls(ch_in=cfg.ch_in, ch_out=cfg.ch_out,
               pool_method=cfg.pool_method, act_fun=cfg.act_fun,
               normalization=cfg.normalization, filters=tuple(cfg.filters),
               dtype=dtype, axis_name=axis_name, remat_policy=remat_policy,
               up_impl=up_impl, quantize=quantize)
