"""Neck zoo: RepBiPAN / BiPAN and their inverted ("Deconv") decoders.

TPU-native re-design of /root/reference/modules/common.py:549-849. The
channel-math (width-multiple rounding to /8 and the None-insertion trick for
conv-less BiC modules, common.py:575-582) is reproduced exactly so user
configs and channel counts carry over; implementation is flax/NHWC.

Static `*_out_channels` helpers mirror the reference's `out_fmaps_channels`
attributes so models can be wired without parameter initialisation.
"""
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .blocks import (
    BiCwithConvModule,
    BiCwithNoConvModule,
    C3Module,
    ConvBNorm,
    ConvBNormUpsample,
    CSPSPPFModule,
    RepBlock,
    SPPFModule,
    channels8,
    depth_round,
    maybe_remat,
)

Dtype = Any


def _pan_channel_outs(base8: Sequence[int], base10: Sequence[int],
                      width_multiple: float, bic_with_conv: bool):
    """Reference channel_outs computation incl. None-insertions (common.py:568-582)."""
    if bic_with_conv:
        outs = [channels8(x, width_multiple) for x in base10]
    else:
        outs = [channels8(x, width_multiple) for x in base8]
        outs.insert(1, None)
        outs.insert(4, None)
    return outs


def _bic(bic_with_conv: bool, out_channels, upsample_mode: str, dtype, name: str,
         remat: bool = False):
    cls = BiCwithConvModule if bic_with_conv else BiCwithNoConvModule
    # BiC __call__ is (self, c1, c0, p2, train) -> train is bound arg 4
    cls = maybe_remat(cls, remat, static_argnums=(4,))
    return cls(out_channels, upsample_mode=upsample_mode, dtype=dtype, name=name)


# ---------------------------------------------------------------- RepBiPAN

_REPBIPAN_BASE8 = [512, 512, 256, 256, 256, 512, 512, 1024]
_REPBIPAN_BASE10 = [512, 512, 512, 256, 256, 256, 256, 512, 512, 1024]


def repbipan_out_channels(in_channels: Sequence[int], width_multiple: float = 0.5,
                          bic_with_conv: bool = False, **_) -> Tuple[int, int, int, int]:
    c2 = in_channels[0]
    ch = _pan_channel_outs(_REPBIPAN_BASE8, _REPBIPAN_BASE10, width_multiple, bic_with_conv)
    return (c2, ch[5], ch[7], ch[9])


class RepBiPAN(nn.Module):
    """YOLOv6-style reparameterisable bi-directional PAN (reference common.py:549-618).

    Input: (c2, c3, c4, c5) at strides 4/8/16/32. Output: (c2, n3, n4, n5).
    """

    width_multiple: float = 0.5
    depth_multiple: float = 0.3
    cspsppf_poolk: int = 5
    upsample_mode: str = "nearest"
    bic_with_conv: bool = False
    # "silu" = reference-parity branch activations; None = canonical RepVGG
    # (fully fusable at deploy) — see blocks.RepVGGBlock docstring
    repvgg_branch_act: Optional[str] = "silu"
    deploy: bool = False
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fmaps: Sequence[jnp.ndarray], train: bool = False):
        c2, c3, c4, c5 = fmaps
        depths = [depth_round(d, self.depth_multiple) for d in [1, 1, 1, 1]]
        ch = _pan_channel_outs(_REPBIPAN_BASE8, _REPBIPAN_BASE10, self.width_multiple, self.bic_with_conv)
        Rep = maybe_remat(RepBlock, self.remat)
        Conv = maybe_remat(ConvBNorm, self.remat)
        Sppf = maybe_remat(CSPSPPFModule, self.remat)
        rep = lambda co, n, name: Rep(  # noqa: E731
            co, n=n, branch_activation=self.repvgg_branch_act,
            deploy=self.deploy, dtype=self.dtype, name=name)

        p5 = Sppf(c5.shape[-1], pool_kernel_size=self.cspsppf_poolk,
                  dtype=self.dtype, name="cspsppf0")(c5, train)
        y0 = Conv(ch[0], kernel_size=1, dtype=self.dtype, name="conv0")(p5, train)
        b0 = _bic(self.bic_with_conv, ch[1], self.upsample_mode, self.dtype, "bic0",
                  self.remat)(c4, c3, y0, train)
        p4 = rep(ch[2], depths[0], "repblock0")(b0, train)
        y1 = Conv(ch[3], kernel_size=1, dtype=self.dtype, name="conv1")(p4, train)
        b1 = _bic(self.bic_with_conv, ch[4], self.upsample_mode, self.dtype, "bic1",
                  self.remat)(c3, c2, y1, train)
        p3 = rep(ch[5], depths[1], "repblock1")(b1, train)
        n3 = p3
        d0 = Conv(ch[6], kernel_size=3, stride=2, dtype=self.dtype, name="conv2")(n3, train)
        n4 = rep(ch[7], depths[2], "repblock2")(jnp.concatenate([d0, p4], axis=-1), train)
        d1 = Conv(ch[8], kernel_size=3, stride=2, dtype=self.dtype, name="conv3")(n4, train)
        n5 = rep(ch[9], depths[3], "repblock3")(jnp.concatenate([d1, p5], axis=-1), train)
        return c2, n3, n4, n5


# --------------------------------------------------------- DeconvRepBiPAN

_DREPBIPAN_BASE8 = [256, 256, 512, 512, 512, 256, 256, 128]
_DREPBIPAN_BASE10 = [256, 256, 256, 512, 512, 512, 512, 256, 256, 128]


def deconv_repbipan_out_channels(in_channels: Sequence[int], width_multiple: float = 0.5,
                                 bic_with_conv: bool = False, **_) -> Tuple[int, int, int, int]:
    n5 = in_channels[3]
    ch = _pan_channel_outs(_DREPBIPAN_BASE8, _DREPBIPAN_BASE10, width_multiple, bic_with_conv)
    return (n5, ch[5], ch[7], ch[9])


class DeconvRepBiPAN(nn.Module):
    """Inverted RepBiPAN decoder (reference common.py:621-693).

    Input: (c2, n3, n4, n5). Output: (n5, f4, f3, f2) deep -> shallow.
    """

    width_multiple: float = 0.5
    depth_multiple: float = 0.3
    cspsppf_poolk: int = 5
    upsample_mode: str = "nearest"
    bic_with_conv: bool = False
    repvgg_branch_act: Optional[str] = "silu"
    deploy: bool = False
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fmaps: Sequence[jnp.ndarray], train: bool = False):
        c2, n3, n4, n5 = fmaps
        depths = [depth_round(d, self.depth_multiple) for d in [1, 1, 1, 1]]
        ch = _pan_channel_outs(_DREPBIPAN_BASE8, _DREPBIPAN_BASE10, self.width_multiple, self.bic_with_conv)
        Rep = maybe_remat(RepBlock, self.remat)
        Conv = maybe_remat(ConvBNorm, self.remat)
        Up = maybe_remat(ConvBNormUpsample, self.remat)
        Sppf = maybe_remat(CSPSPPFModule, self.remat)
        rep = lambda co, n, name: Rep(  # noqa: E731
            co, n=n, branch_activation=self.repvgg_branch_act,
            deploy=self.deploy, dtype=self.dtype, name=name)

        q2 = c2
        d0 = Conv(ch[0], kernel_size=1, dtype=self.dtype, name="deconv0")(q2, train)
        q3 = rep(ch[2], depths[0], "repblock0")(
            _bic(self.bic_with_conv, ch[1], self.upsample_mode, self.dtype, "bic0",
                 self.remat)(n3, d0, n4, train), train)
        d1 = Conv(ch[3], kernel_size=1, dtype=self.dtype, name="deconv1")(q3, train)
        q4 = rep(ch[5], depths[1], "repblock1")(
            _bic(self.bic_with_conv, ch[4], self.upsample_mode, self.dtype, "bic1",
                 self.remat)(n4, d1, n5, train), train)
        f4 = Sppf(ch[5], pool_kernel_size=self.cspsppf_poolk,
                  dtype=self.dtype, name="cspsppf")(q4, train)
        u0 = Up(ch[6], scale=2, dtype=self.dtype, name="deconv2")(f4, train)
        f3 = rep(ch[7], depths[2], "repblock2")(jnp.concatenate([u0, q3], axis=-1), train)
        u1 = Up(ch[8], scale=2, dtype=self.dtype, name="deconv3")(f3, train)
        f2 = rep(ch[9], depths[3], "repblock3")(jnp.concatenate([u1, q2], axis=-1), train)
        return n5, f4, f3, f2


# ------------------------------------------------------------------ BiPAN

_BIPAN_BASE8 = _REPBIPAN_BASE8
_BIPAN_BASE10 = _REPBIPAN_BASE10


def bipan_out_channels(in_channels: Sequence[int], width_multiple: float = 0.5,
                       bic_with_conv: bool = False, **_) -> Tuple[int, int, int, int]:
    f1 = in_channels[0]
    ch = _pan_channel_outs(_BIPAN_BASE8, _BIPAN_BASE10, width_multiple, bic_with_conv)
    return (f1, ch[5], ch[7], ch[9])


class BiPAN(nn.Module):
    """YOLOv5-flavoured bi-directional PAN with C3/SPPF (reference common.py:696-767)."""

    width_multiple: float = 0.5
    depth_multiple: float = 0.3
    sppf_poolk: int = 5
    upsample_mode: str = "nearest"
    bic_with_conv: bool = False
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fmaps: Sequence[jnp.ndarray], train: bool = False):
        f1, f2_, f3_, f4_ = fmaps
        depths = [depth_round(d, self.depth_multiple) for d in [3, 6, 9, 3]]
        ch = _pan_channel_outs(_BIPAN_BASE8, _BIPAN_BASE10, self.width_multiple, self.bic_with_conv)
        Conv = maybe_remat(ConvBNorm, self.remat)
        C3 = maybe_remat(C3Module, self.remat)
        Sppf = maybe_remat(SPPFModule, self.remat)

        y0 = Conv(ch[0], kernel_size=1, dtype=self.dtype, name="conv0")(
            Sppf(f4_.shape[-1], pool_kernel_size=self.sppf_poolk,
                 dtype=self.dtype, name="sppf0")(f4_, train), train)
        c2 = C3(ch[2], num_bottlenecks=depths[0], dtype=self.dtype, name="c3_0")(
            _bic(self.bic_with_conv, ch[1], self.upsample_mode, self.dtype, "bic0",
                 self.remat)(f3_, f2_, y0, train), train)
        y2 = Conv(ch[3], kernel_size=1, dtype=self.dtype, name="conv1")(c2, train)
        y3 = C3(ch[5], num_bottlenecks=depths[1], dtype=self.dtype, name="c3_1")(
            _bic(self.bic_with_conv, ch[4], self.upsample_mode, self.dtype, "bic1",
                 self.remat)(f2_, f1, y2, train), train)
        y4 = Conv(ch[6], kernel_size=3, stride=2, dtype=self.dtype, name="conv2")(y3, train)
        y5 = C3(ch[7], num_bottlenecks=depths[2], dtype=self.dtype, name="c3_2")(
            jnp.concatenate([y4, y2], axis=-1), train)
        y6 = Conv(ch[8], kernel_size=3, stride=2, dtype=self.dtype, name="conv3")(y5, train)
        y7 = C3(ch[9], num_bottlenecks=depths[3], dtype=self.dtype, name="c3_3")(
            jnp.concatenate([y6, y0], axis=-1), train)
        return f1, y3, y5, y7


# ------------------------------------------------------------ DeconvBiPAN

_DBIPAN_BASE8 = _DREPBIPAN_BASE8
_DBIPAN_BASE10 = _DREPBIPAN_BASE10


def deconv_bipan_out_channels(in_channels: Sequence[int], width_multiple: float = 0.5,
                              bic_with_conv: bool = False, **_) -> Tuple[int, int, int, int]:
    y7 = in_channels[3]
    ch = _pan_channel_outs(_DBIPAN_BASE8, _DBIPAN_BASE10, width_multiple, bic_with_conv)
    return (y7, ch[5], ch[7], ch[9])


class DeconvBiPAN(nn.Module):
    """Inverted BiPAN decoder (reference common.py:770-849)."""

    width_multiple: float = 0.5
    depth_multiple: float = 0.3
    sppf_poolk: int = 5
    upsample_mode: str = "nearest"
    bic_with_conv: bool = False
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fmaps: Sequence[jnp.ndarray], train: bool = False):
        fmap1, y3, y5, y7 = fmaps
        depths = [depth_round(d, self.depth_multiple) for d in [3, 6, 9, 3]]
        ch = _pan_channel_outs(_DBIPAN_BASE8, _DBIPAN_BASE10, self.width_multiple, self.bic_with_conv)
        Conv = maybe_remat(ConvBNorm, self.remat)
        C3 = maybe_remat(C3Module, self.remat)
        Up = maybe_remat(ConvBNormUpsample, self.remat)
        Sppf = maybe_remat(SPPFModule, self.remat)

        f0 = Conv(ch[0], kernel_size=1, dtype=self.dtype, name="deconv0")(fmap1, train)
        f1 = C3(ch[2], num_bottlenecks=depths[0], dtype=self.dtype, name="c3_0")(
            _bic(self.bic_with_conv, ch[1], self.upsample_mode, self.dtype, "bic0",
                 self.remat)(y3, f0, y5, train), train)
        f2 = Conv(ch[3], kernel_size=1, dtype=self.dtype, name="deconv1")(f1, train)
        f3 = C3(ch[5], num_bottlenecks=depths[1], dtype=self.dtype, name="c3_1")(
            _bic(self.bic_with_conv, ch[4], self.upsample_mode, self.dtype, "bic1",
                 self.remat)(y5, f2, y7, train), train)
        f4 = Up(ch[6], scale=2, dtype=self.dtype, name="deconv2")(
            Sppf(f3.shape[-1], pool_kernel_size=self.sppf_poolk,
                 dtype=self.dtype, name="sppf")(f3, train), train)
        f5 = C3(ch[7], num_bottlenecks=depths[2], dtype=self.dtype, name="c3_2")(
            jnp.concatenate([f4, f2], axis=-1), train)
        f6 = Up(ch[8], scale=2, dtype=self.dtype, name="deconv3")(f5, train)
        f7 = C3(ch[9], num_bottlenecks=depths[3], dtype=self.dtype, name="c3_3")(
            jnp.concatenate([f6, f0], axis=-1), train)
        return y7, f3, f5, f7
