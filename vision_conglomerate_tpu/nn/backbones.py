"""Backbones: CSPNet (YOLOv5-style), its decoder mirror, and ResNet.

TPU-native re-design of /root/reference/modules/common.py:414-528 and
/root/reference/modules/backbone.py:9-49. All NHWC; output-channel metadata
is exposed as static helpers so model assembly can wire necks/heads without
initialising parameters.
"""
import math
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .blocks import (
    BatchNorm,
    C3Module,
    ConvBNorm,
    ConvBNormUpsample,
    channels8,
    depth_round,
    maybe_remat,
)

Dtype = Any


def _cspnet_channels(width_multiple: float,
                     early_min_channels: Optional[int] = None) -> list:
    """Per-layer channel plan (reference rule common.py:426). With
    `early_min_channels`, the three early layers (stem + stride-2 conv +
    stride-4 C3) are clamped UP to at least that many channels — a TPU
    architecture knob (docs/PERF.md lever #2): at width 0.5 those layers run
    16/32/64 channels at 320²/160² resolution, using 9-18% of the 128-deep
    MXU; widening toward lane depth trades FLOPs for utilization.
    Accuracy-gated — it changes capacity, so it is OFF by default and the
    YAML key (cspbackbone_config.early_min_channels) opts in per run."""
    co = [channels8(x, width_multiple) for x in [32, 64, 128, 256, 256, 512, 512, 1024, 1024]]
    if early_min_channels:
        for i in range(3):
            co[i] = max(co[i], int(early_min_channels))
    return co


def cspnet_out_channels(width_multiple: float = 0.5,
                        early_min_channels: Optional[int] = None) -> Tuple[int, int, int, int]:
    """Static out_fmaps_channels of CSPNet (reference common.py:441-443)."""
    co = _cspnet_channels(width_multiple, early_min_channels)
    return (co[2], co[4], co[6], co[8])


def space_to_depth_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel order ((dy*2+dx)*C + c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


class CSPNet(nn.Module):
    """Cross-stage-partial backbone; emits 4 fmaps at strides 4/8/16/32
    (reference common.py:414-465). Input H, W must be divisible by 32.

    space_to_depth_stem: replaces the k6/s2/p2 stem conv with
    space-to-depth + k3/s1/p1 on 4x channels — the SAME function (see
    nn/reparam.s2d_stem_params for the exact kernel rearrangement) with
    better MXU lane utilization at 3 input channels. Param shapes differ, so
    it is an architecture choice (or a deploy-time transform), not a
    checkpoint-compatible toggle.
    """

    width_multiple: float = 0.5
    depth_multiple: float = 0.3
    dropout: float = 0.0
    space_to_depth_stem: bool = False
    early_min_channels: Optional[int] = None  # see _cspnet_channels
    remat: bool = False  # recompute stage interiors in backward (maybe_remat)
    dtype: Dtype = jnp.float32

    @property
    def out_fmaps_channels(self) -> Tuple[int, int, int, int]:
        return cspnet_out_channels(self.width_multiple, self.early_min_channels)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        if x.shape[1] % 32 != 0 or x.shape[2] % 32 != 0:
            raise ValueError("input must have width and height divisible by 32")
        depths = [depth_round(d, self.depth_multiple) for d in [3, 6, 9, 3]]
        co = _cspnet_channels(self.width_multiple, self.early_min_channels)
        drop = nn.Dropout(self.dropout, deterministic=not train)
        Conv = maybe_remat(ConvBNorm, self.remat)
        C3 = maybe_remat(C3Module, self.remat)

        if self.space_to_depth_stem:
            out = Conv(co[0], kernel_size=3, stride=1, padding=1,
                       dtype=self.dtype, name="conv0")(space_to_depth_nhwc(x), train)
        else:
            out = Conv(co[0], kernel_size=6, stride=2, padding=2, dtype=self.dtype, name="conv0")(x, train)
        out = Conv(co[1], kernel_size=3, stride=2, padding=1, dtype=self.dtype, name="conv1")(out, train)
        out = drop(out)
        fmap1 = C3(co[2], num_bottlenecks=depths[0], dtype=self.dtype, name="c3_0")(out, train)
        out = Conv(co[3], kernel_size=3, stride=2, padding=1, dtype=self.dtype, name="conv2")(fmap1, train)
        out = drop(out)
        fmap2 = C3(co[4], num_bottlenecks=depths[1], dtype=self.dtype, name="c3_1")(out, train)
        out = Conv(co[5], kernel_size=3, stride=2, padding=1, dtype=self.dtype, name="conv3")(fmap2, train)
        out = drop(out)
        fmap3 = C3(co[6], num_bottlenecks=depths[2], dtype=self.dtype, name="c3_2")(out, train)
        out = Conv(co[7], kernel_size=3, stride=2, padding=1, dtype=self.dtype, name="conv4")(fmap3, train)
        fmap4 = C3(co[8], num_bottlenecks=depths[3], dtype=self.dtype, name="c3_3")(out, train)
        return fmap1, fmap2, fmap3, fmap4


class CSPBackBone(CSPNet):
    """Alias of CSPNet (reference backbone.py:9-11)."""


def deconv_cspnet_out_channels(width_multiple: float = 0.5) -> Tuple[int, ...]:
    co = [channels8(x, width_multiple) for x in [1024, 1024, 512, 512, 256, 256, 128, 64]]
    return tuple(co)


class DeconvCSPNet(nn.Module):
    """Mirror decoder of CSPNet for the TrackNet advanced arch
    (reference common.py:468-528). Consumes 4 fmaps (deep -> shallow order as
    produced by DeconvRepBiPAN), emits a single full-res map."""

    out_channels: int
    width_multiple: float = 0.5
    depth_multiple: float = 0.3
    dropout: float = 0.0
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fmaps: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        fmap1, fmap2, fmap3, fmap4 = fmaps
        depths = [depth_round(d, self.depth_multiple) for d in [3, 9, 6, 3]]
        co = [channels8(c, self.width_multiple) for c in [1024, 1024, 512, 512, 256, 256, 128, 64]]
        drop = nn.Dropout(self.dropout, deterministic=not train)
        C3 = maybe_remat(C3Module, self.remat)
        Up = maybe_remat(ConvBNormUpsample, self.remat)

        out = C3(co[0], num_bottlenecks=depths[0], dtype=self.dtype, name="c3_0")(fmap1, train)
        out = Up(co[1], scale=2, dtype=self.dtype, name="deconv0")(out, train)
        out = drop(out)
        out = C3(co[2], num_bottlenecks=depths[1], dtype=self.dtype, name="c3_1")(
            jnp.concatenate([out, fmap2], axis=-1), train)
        out = Up(co[3], scale=2, dtype=self.dtype, name="deconv1")(out, train)
        out = drop(out)
        out = C3(co[4], num_bottlenecks=depths[2], dtype=self.dtype, name="c3_2")(
            jnp.concatenate([out, fmap3], axis=-1), train)
        out = Up(co[5], scale=2, dtype=self.dtype, name="deconv2")(out, train)
        out = drop(out)
        out = C3(co[6], num_bottlenecks=depths[3], dtype=self.dtype, name="c3_3")(
            jnp.concatenate([out, fmap4], axis=-1), train)
        out = Up(co[7], scale=2, dtype=self.dtype, name="deconv3")(out, train)
        out = ConvBNormUpsample(
            self.out_channels, scale=2, no_batchnorm=True, dtype=self.dtype, name="deconv4"
        )(out, train)
        return out


class _ResNetBasicBlock(nn.Module):
    out_channels: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        out = nn.Conv(self.out_channels, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(name="bn1")(out, train).astype(self.dtype)
        out = nn.relu(out)
        out = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(name="bn2")(out, train).astype(self.dtype)
        if self.downsample:
            identity = nn.Conv(self.out_channels, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = BatchNorm(name="downsample_bn")(identity, train).astype(self.dtype)
        return nn.relu(out + identity)


class _ResNetBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(name="bn1")(out, train).astype(self.dtype)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(name="bn2")(out, train).astype(self.dtype)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(name="bn3")(out, train).astype(self.dtype)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = BatchNorm(name="downsample_bn")(identity, train).astype(self.dtype)
        return nn.relu(out + identity)


def resnet_out_channels(block: str = "BasicBlock") -> Tuple[int, int, int, int]:
    """Reference backbone.py:30-33."""
    if block == "BasicBlock":
        return (64, 128, 256, 512)
    return (256, 512, 1024, 2048)


class ResNetBackBone(nn.Module):
    """ResNet backbone with the reference's two-7x7-stride-2-stem variant
    (reference backbone.py:14-49): conv1(7x7/s2) -> conv2(7x7/s2) -> bn ->
    relu -> dropout -> layer1..4; returns the four stage fmaps."""

    dropout: float = 0.0
    block: str = "BasicBlock"  # "BasicBlock" | "Bottleneck"
    block_layers: Optional[Tuple[int, ...]] = None
    dtype: Dtype = jnp.float32

    @property
    def out_fmaps_channels(self) -> Tuple[int, int, int, int]:
        return resnet_out_channels(self.block)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        if x.shape[1] % 32 != 0 or x.shape[2] % 32 != 0:
            raise ValueError("input must have width and height divisible by 32")
        layers = tuple(self.block_layers or (3, 4, 6, 3))
        planes = (64, 128, 256, 512)
        strides = (1, 2, 2, 2)
        expansion = 1 if self.block == "BasicBlock" else 4
        block_cls = _ResNetBasicBlock if self.block == "BasicBlock" else _ResNetBottleneck

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = BatchNorm(name="bn1")(x, train).astype(self.dtype)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        fmaps = []
        in_ch = 64
        for li, (n_blocks, p, s) in enumerate(zip(layers, planes, strides)):
            for bi in range(n_blocks):
                stride = s if bi == 0 else 1
                need_ds = (stride != 1) or (in_ch != p * expansion)
                if self.block == "BasicBlock":
                    x = block_cls(p, stride=stride, downsample=need_ds,
                                  dtype=self.dtype, name=f"layer{li + 1}_{bi}")(x, train)
                else:
                    x = block_cls(p, stride=stride, downsample=need_ds,
                                  dtype=self.dtype, name=f"layer{li + 1}_{bi}")(x, train)
                in_ch = p * expansion
            fmaps.append(x)
        return tuple(fmaps)
