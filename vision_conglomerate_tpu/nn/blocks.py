"""Core convolutional block zoo (flax.linen, NHWC layout).

TPU-first re-design of the reference module zoo
(/root/reference/modules/common.py:8-966). Semantics (channel math, quirks
like the SPPF `[y, p2, p2, p3]` concat at common.py:374-377 and the shared
regression tower in EffiDecHead at common.py:908-909) are preserved; the
implementation is pure-functional flax in NHWC so XLA can tile convs onto the
MXU and fuse BN/activation elementwise epilogues.

Conventions:
- every module takes `train: bool` (BatchNorm mode) and has a `dtype` field
  (compute dtype; params always float32). BatchNorm runs in float32.
- BatchNorm momentum 0.9 == torch momentum 0.1; eps 1e-5 (torch defaults).
- submodule attribute names mirror the reference classes so checkpoints and
  the RepVGG re-parameterisation transform address the same tree paths.
"""
import contextlib
import contextvars
import math
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import resize_nhwc

Dtype = Any

# Deploy-time BatchNorm folding: when active, ConvBNorm/ConvTransposeBNorm
# skip their norm entirely — the params are expected to have been transformed
# by nn.reparam.fold_conv_bn_params (BN folded into conv kernel+bias). This
# removes every BN elementwise pass + f32 round-trip from the serving path.
_FOLD_BN = contextvars.ContextVar("vct_fold_bn", default=False)


@contextlib.contextmanager
def bn_folding(enabled: bool = True):
    token = _FOLD_BN.set(enabled)
    try:
        yield
    finally:
        _FOLD_BN.reset(token)


def bn_folding_active() -> bool:
    return _FOLD_BN.get()


# Fused pointwise serving mode: 1x1/stride-1 convs in BN-folded deploy mode
# run as ONE Pallas matmul+bias+activation pass (ops/fused_matmul.py) instead
# of conv followed by a separate elementwise HBM pass.
_FUSED_POINTWISE = contextvars.ContextVar("vct_fused_pointwise", default=False)


@contextlib.contextmanager
def fused_pointwise(enabled: bool = True):
    token = _FUSED_POINTWISE.set(enabled)
    try:
        yield
    finally:
        _FUSED_POINTWISE.reset(token)


def fused_pointwise_active() -> bool:
    return _FUSED_POINTWISE.get()


def maybe_remat(cls, enable: bool, static_argnums: Tuple[int, ...] = (2,)):
    """Stage-granular rematerialization for the training backward pass.

    Wraps a module class in nn.remat so its interior activations are
    recomputed during backward instead of stored — trades ~1 extra forward
    of FLOPs inside the wrapped stage for O(stage boundaries) activation
    memory, raising the max train batch (the MFU lever: small batches
    underfill the MXU). Transparent to the variable tree, outputs, grads
    and batch_stats mutation (tests/test_remat.py). static_argnums indexes
    the bound __call__ args with self at 0 — (2,) for `(self, x, train)`.
    """
    return nn.remat(cls, static_argnums=static_argnums) if enable else cls


class _FusedPointwiseConv(nn.Module):
    """Param-compatible stand-in for nn.Conv(1x1) running the fused Pallas
    matmul+bias+activation kernel. Named 'conv' by the caller so the folded
    deploy params address the same tree paths."""

    features: int
    activation: Optional[str]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.fused_matmul import pointwise_conv_act

        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return pointwise_conv_act(
            x.astype(self.dtype), kernel.astype(self.dtype),
            bias.astype(jnp.float32), self.activation)


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    return (int(v[0]), int(v[1]))


def channels8(x: Optional[float], width_multiple: float, divisor: int = 8) -> Optional[int]:
    """Reference channel width rule: ceil(x*wm/8)*8 (common.py:426); None passes through."""
    if not x:
        return x
    return int(math.ceil((x * width_multiple) / divisor) * divisor)


def depth_round(x: float, depth_multiple: float) -> int:
    """Reference depth rule: max(round(x*dm), 1) (common.py:425)."""
    return max(round(x * depth_multiple), 1)


def get_activation(name: Optional[str]):
    if name is None or name == "none":
        return lambda x: x
    table = {
        "silu": jax.nn.silu,
        "relu": jax.nn.relu,
        "gelu": jax.nn.gelu,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "leaky_relu": jax.nn.leaky_relu,
    }
    return table[name]


class BatchNorm(nn.Module):
    """BatchNorm2d equivalent: float32 compute, torch-default hyperparams."""

    momentum: float = 0.9  # == torch momentum 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None  # set for cross-replica (sync) BN

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            axis_name=self.axis_name if train else None,
        )(x)


class ConvBNorm(nn.Module):
    """Conv2d + BatchNorm + activation (reference common.py:8-51)."""

    out_channels: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Optional[Union[int, Tuple[int, int]]] = None
    activation: Optional[str] = "silu"
    use_bias: bool = True
    no_batchnorm: bool = False
    batchnorm_first: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = _pair(self.kernel_size)
        if self.padding is None:
            p = (k[0] // 2, k[1] // 2)
        else:
            p = _pair(self.padding)
        # folded deploy mode: BN is pre-folded into the conv params, which
        # then ALWAYS carry a bias (even for use_bias=False train-form convs
        # like the RepVGG branches — the folded BN shift becomes the bias)
        folded = bn_folding_active() and self.batchnorm_first and not self.no_batchnorm
        if folded:
            from .quantize import (
                calibrating_active, int8_serving_active, quantized_conv)

            pad_lax = (p, p) if isinstance(p[0], tuple) else (
                (p[0], p[0]), (p[1], p[1]))
            if calibrating_active():
                self.sow("intermediates", "act_absmax",
                         jnp.max(jnp.abs(x.astype(jnp.float32))))
            if int8_serving_active() and self.has_variable("params", "q_kernel"):
                conv_fn = lambda xq, wq: jax.lax.conv_general_dilated(  # noqa: E731
                    xq, wq, _pair(self.stride), pad_lax,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                return quantized_conv(
                    x, self, conv_fn, get_activation(self.activation), self.dtype)
        if (
            folded
            and fused_pointwise_active()
            and k == (1, 1)
            and _pair(self.stride) == (1, 1)
            and self.activation in ("silu", "relu", None)
        ):
            y = _FusedPointwiseConv(
                self.out_channels, self.activation, dtype=self.dtype, name="conv")(x)
            return y.astype(self.dtype)
        x = nn.Conv(
            self.out_channels,
            kernel_size=k,
            strides=_pair(self.stride),
            padding=(p, p) if isinstance(p[0], tuple) else ((p[0], p[0]), (p[1], p[1])),
            use_bias=self.use_bias or folded,
            dtype=self.dtype,
            name="conv",
        )(x)
        act = get_activation(self.activation)
        if self.no_batchnorm or folded:
            return act(x).astype(self.dtype)
        norm = BatchNorm(name="norm")
        if self.batchnorm_first:
            x = norm(x, train)
            x = act(x)
        else:
            x = act(x)
            x = norm(x, train)
        return x.astype(self.dtype)


class ConvTransposeBNorm(nn.Module):
    """ConvTranspose2d + BatchNorm + activation (reference common.py:54-92)."""

    out_channels: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Optional[Union[int, Tuple[int, int]]] = None
    activation: Optional[str] = "silu"
    use_bias: bool = True
    no_batchnorm: bool = False
    batchnorm_first: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = _pair(self.kernel_size)
        p = _pair(self.padding or 0)
        # folded deploy mode: like ConvBNorm, the folded BN shift becomes a
        # bias, so the transpose conv must carry one even for use_bias=False
        # train-form modules (fold_conv_bn_params always emits a bias).
        folded = bn_folding_active() and self.batchnorm_first and not self.no_batchnorm
        # torch ConvTranspose2d output = (i-1)*s - 2p + k. flax ConvTranspose
        # pads the *output*; torch-style crop-padding maps to flax padding
        # ((k-1-p, k-1-p), ...) with transpose_kernel semantics.
        x = nn.ConvTranspose(
            self.out_channels,
            kernel_size=k,
            strides=_pair(self.stride),
            padding=((k[0] - 1 - p[0], k[0] - 1 - p[0]), (k[1] - 1 - p[1], k[1] - 1 - p[1])),
            use_bias=self.use_bias or folded,
            dtype=self.dtype,
            name="conv_transpose",
        )(x)
        act = get_activation(self.activation)
        if self.no_batchnorm or folded:
            return act(x).astype(self.dtype)
        norm = BatchNorm(name="norm")
        if self.batchnorm_first:
            x = norm(x, train)
            x = act(x)
        else:
            x = act(x)
            x = norm(x, train)
        return x.astype(self.dtype)


class ConvBNormUpsample(nn.Module):
    """3x3 ConvBNorm followed by nearest/bilinear resize (reference common.py:95-125)."""

    out_channels: int
    scale: float
    upsample_mode: str = "nearest"
    activation: Optional[str] = "silu"
    no_batchnorm: bool = False
    batchnorm_first: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBNorm(
            self.out_channels,
            kernel_size=3,
            stride=1,
            padding=1,
            activation=self.activation,
            no_batchnorm=self.no_batchnorm,
            batchnorm_first=self.batchnorm_first,
            dtype=self.dtype,
            name="conv",
        )(x, train)
        return resize_nhwc(x, scale=self.scale, method=self.upsample_mode)


class RepVGGBlock(nn.Module):
    """RepVGG block (reference common.py:137-229).

    Train form: 3x3 conv-BN + 1x1 conv-BN (+ identity BN when stride==1 and
    in_channels==out_channels), summed, then activation.

    NOTE (reference quirk, preserved by default): the reference builds its
    branches as plain ConvBNorm, whose DEFAULT activation is SiLU
    (common.py:155-160 never passes activation=None) — so each branch is
    conv -> BN -> SiLU, deviating from the RepVGG paper (activation-free
    branches) and making the reference's own `toggle_inference_mode` fusion
    NOT function-preserving (it silently drops the branch SiLUs;
    the shipped reference CLIs never call it, so this goes unnoticed).
    `branch_activation="silu"` (default) reproduces the reference train-form
    exactly; `branch_activation=None` selects the canonical paper block,
    which IS exactly fusable into a single 3x3 conv (`deploy=True` + params
    from nn.reparam.reparameterize_params). With branch activations, the
    deploy optimization is BN folding only (nn.reparam.fold_conv_bn_params).
    """

    in_channels: int
    out_channels: int
    activation: Optional[str] = "silu"
    stride: Union[int, Tuple[int, int]] = 1
    padding: Optional[int] = None
    branch_activation: Optional[str] = "silu"
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @property
    def has_identity(self) -> bool:
        return _pair(self.stride) == (1, 1) and self.in_channels == self.out_channels

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = self.padding if self.padding is not None else 3 // 2
        act = get_activation(self.activation)
        if self.deploy:
            if self.branch_activation is not None:
                raise ValueError(
                    "deploy=True (single fused conv) requires "
                    "branch_activation=None (canonical RepVGG); "
                    "reference-parity blocks deploy via BN folding instead")
            from .quantize import (
                calibrating_active, int8_serving_active, quantized_conv)

            if calibrating_active():
                self.sow("intermediates", "act_absmax",
                         jnp.max(jnp.abs(x.astype(jnp.float32))))
            if int8_serving_active() and self.has_variable("params", "q_kernel"):
                conv_fn = lambda xq, wq: jax.lax.conv_general_dilated(  # noqa: E731
                    xq, wq, _pair(self.stride), ((pad, pad), (pad, pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                return quantized_conv(x, self, conv_fn, act, self.dtype)
            out = nn.Conv(
                self.out_channels,
                kernel_size=(3, 3),
                strides=_pair(self.stride),
                padding=((pad, pad), (pad, pad)),
                use_bias=True,
                dtype=self.dtype,
                name="conv_reparam",
            )(x)
            return act(out).astype(self.dtype)

        out = ConvBNorm(
            self.out_channels, kernel_size=(3, 3), stride=self.stride,
            padding=pad, use_bias=False, activation=self.branch_activation,
            dtype=self.dtype, name="conv3x3",
        )(x, train)
        out = out + ConvBNorm(
            self.out_channels, kernel_size=(1, 1), stride=self.stride,
            padding=pad - 1, use_bias=False, activation=self.branch_activation,
            dtype=self.dtype, name="conv1x1",
        )(x, train)
        if self.has_identity:
            out = out + BatchNorm(name="identity")(x, train).astype(self.dtype)
        return act(out).astype(self.dtype)


class RepBlock(nn.Module):
    """Stack of RepVGG blocks with hidden width e*out (reference common.py:232-254)."""

    out_channels: int
    n: int = 1
    e: float = 0.5
    branch_activation: Optional[str] = "silu"
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cin = x.shape[-1]
        c_h = int(self.out_channels * self.e)
        mk = lambda ci, co, name: RepVGGBlock(  # noqa: E731
            ci, co, branch_activation=self.branch_activation,
            deploy=self.deploy, dtype=self.dtype, name=name
        )
        if self.n == 1:
            x = mk(cin, self.out_channels, "conv1")(x, train)
        elif self.n == 2:
            x = mk(cin, c_h, "conv1")(x, train)
            x = mk(c_h, self.out_channels, "blocks_0")(x, train)
        elif self.n > 2:
            x = mk(cin, c_h, "conv1")(x, train)
            for i in range(self.n - 2):
                x = mk(c_h, c_h, f"blocks_{i}")(x, train)
            x = mk(c_h, self.out_channels, f"blocks_{self.n - 2}")(x, train)
        else:
            raise ValueError(f"n must be >= 1, got n={self.n}")
        return x


class BiCwithConvModule(nn.Module):
    """Bi-directional concatenation with 1x1 convs (reference common.py:257-287)."""

    out_channels: int
    e: float = 0.5
    upsample_mode: str = "nearest"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c1, c0, p2, train: bool = False) -> jnp.ndarray:
        c_h = int(self.out_channels * self.e)
        c1 = ConvBNorm(c_h, kernel_size=1, dtype=self.dtype, name="conv_c1")(c1, train)
        c0 = ConvBNorm(c_h, kernel_size=1, dtype=self.dtype, name="conv_c0")(c0, train)
        c0 = resize_nhwc(c0, scale=0.5, method=self.upsample_mode)
        p2 = resize_nhwc(p2, scale=2.0, method=self.upsample_mode)
        out = jnp.concatenate([c1, c0, p2], axis=-1)
        return ConvBNorm(self.out_channels, kernel_size=1, dtype=self.dtype, name="conv_out")(out, train)


class BiCwithNoConvModule(nn.Module):
    """Bi-directional concatenation, optional trailing 1x1 conv (reference common.py:290-322).

    out_channels=None -> pure concat (output channels = sum of inputs).
    """

    out_channels: Optional[int] = None
    upsample_mode: str = "nearest"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c1, c0, p2, train: bool = False) -> jnp.ndarray:
        c0 = resize_nhwc(c0, scale=0.5, method=self.upsample_mode)
        p2 = resize_nhwc(p2, scale=2.0, method=self.upsample_mode)
        out = jnp.concatenate([c1, c0, p2], axis=-1)
        if self.out_channels:
            out = ConvBNorm(self.out_channels, kernel_size=1, dtype=self.dtype, name="conv")(out, train)
        return out


def bic_out_channels(
    bic_with_conv: bool, c1: int, c0: int, p2: int, out_channels: Optional[int]
) -> int:
    """Static output-channel computation for either BiC flavour (mirrors reference attrs)."""
    if bic_with_conv:
        assert out_channels is not None
        return out_channels
    return out_channels if out_channels else (c1 + c0 + p2)


class BottleNeckModule(nn.Module):
    """1x1 -> 3x3 bottleneck with optional shortcut (reference common.py:325-337)."""

    out_channels: int
    e: float = 0.5
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cin = x.shape[-1]
        c_h = int(self.out_channels * self.e)
        out = ConvBNorm(c_h, kernel_size=1, stride=1, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBNorm(self.out_channels, kernel_size=3, stride=1, dtype=self.dtype, name="conv2")(out, train)
        if self.shortcut and cin == self.out_channels:
            out = x + out
        return out


class C3Module(nn.Module):
    """CSP C3 block (reference common.py:340-358)."""

    out_channels: int
    e: float = 0.5
    shortcut: bool = True
    num_bottlenecks: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_h = int(self.out_channels * self.e)
        out1 = ConvBNorm(c_h, kernel_size=1, stride=1, dtype=self.dtype, name="conv1")(x, train)
        for i in range(self.num_bottlenecks):
            out1 = BottleNeckModule(
                c_h, e=1.0, shortcut=self.shortcut, dtype=self.dtype, name=f"bottlenecks_{i}"
            )(out1, train)
        out2 = ConvBNorm(c_h, kernel_size=1, stride=1, dtype=self.dtype, name="conv2")(x, train)
        out = jnp.concatenate([out1, out2], axis=-1)
        return ConvBNorm(self.out_channels, kernel_size=1, stride=1, dtype=self.dtype, name="conv3")(out, train)


def _max_pool_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    p = k // 2
    return nn.max_pool(x, (k, k), strides=(1, 1), padding=((p, p), (p, p)))


class SPPFModule(nn.Module):
    """SPPF (reference common.py:361-378).

    NOTE: reproduces the reference's non-canonical concat `[y, p2, p2, p3]`
    (p1 computed but unused, p2 duplicated — common.py:374-377). This is kept
    deliberately for weight/metric parity and documented here.
    """

    out_channels: int
    e: float = 0.5
    pool_kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_h = int(self.out_channels * self.e)
        y = ConvBNorm(c_h, kernel_size=1, stride=1, dtype=self.dtype, name="conv1")(x, train)
        p1 = _max_pool_same(y, self.pool_kernel_size)
        p2 = _max_pool_same(p1, self.pool_kernel_size)
        p3 = _max_pool_same(p2, self.pool_kernel_size)
        out = jnp.concatenate([y, p2, p2, p3], axis=-1)
        return ConvBNorm(self.out_channels, kernel_size=1, stride=1, dtype=self.dtype, name="conv2")(out, train)


class CSPSPPFModule(nn.Module):
    """Cross-stage-partial SPPF (reference common.py:381-411)."""

    out_channels: int
    e: float = 0.5
    pool_kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_h = int(self.out_channels * self.e)
        x1 = ConvBNorm(c_h, kernel_size=1, dtype=self.dtype, name="conv_1_3_4_0")(x, train)
        x1 = ConvBNorm(c_h, kernel_size=3, dtype=self.dtype, name="conv_1_3_4_1")(x1, train)
        x1 = ConvBNorm(c_h, kernel_size=1, dtype=self.dtype, name="conv_1_3_4_2")(x1, train)
        y1 = ConvBNorm(c_h, kernel_size=1, dtype=self.dtype, name="conv2")(x, train)
        x_p1 = _max_pool_same(x1, self.pool_kernel_size)
        x_p2 = _max_pool_same(x_p1, self.pool_kernel_size)
        x_p3 = _max_pool_same(x_p2, self.pool_kernel_size)
        x1 = jnp.concatenate([x1, x_p1, x_p2, x_p3], axis=-1)
        x1 = ConvBNorm(c_h, kernel_size=1, dtype=self.dtype, name="conv5")(x1, train)
        x1 = ConvBNorm(c_h, kernel_size=3, dtype=self.dtype, name="conv6")(x1, train)
        out = jnp.concatenate([x1, y1], axis=-1)
        return ConvBNorm(self.out_channels, kernel_size=1, dtype=self.dtype, name="conv7")(out, train)


class ProtoSegModule(nn.Module):
    """YOLACT prototype head (reference common.py:531-546); output stride = input_stride/2."""

    out_channels: int = 32
    c_h: int = 256
    upsample_mode: str = "nearest"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = ConvBNorm(self.c_h, kernel_size=3, dtype=self.dtype, name="conv1")(x, train)
        out = resize_nhwc(out, scale=2.0, method=self.upsample_mode)
        out = ConvBNorm(self.c_h, kernel_size=3, dtype=self.dtype, name="conv2")(out, train)
        out = ConvBNorm(self.out_channels, kernel_size=1, dtype=self.dtype, name="conv3")(out, train)
        return out


class EffiDecHead(nn.Module):
    """Efficient decoupled head (reference common.py:852-931).

    Output (N, ny, nx, na, 1 + C + 4 + K + 5*Kp) = [conf, cls, bbox, masks, kp].

    NOTE: the reference runs `regression_fmap_layer(stem)` twice — once for
    conf, once for bbox (common.py:908-909) — with the *same* weights, so the
    two results are identical in eval; we compute the tower once and reuse it
    (XLA would CSE the duplicate anyway). The only divergence is that torch's
    double call nudges BN running stats twice per step; functionally benign
    and documented here.
    """

    num_classes: int
    num_anchors: int = 3
    num_masks: Optional[int] = None
    num_keypoints: Optional[int] = None
    width_multiple: float = 1.0
    reg_fmap_depth: int = 1
    cls_fmap_depth: int = 1
    masks_fmap_depth: Optional[int] = None
    keypoints_fmap_depth: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 raw_fields: bool = False):
        n, ny, nx, cin = x.shape
        stem_out = max(round(cin * self.width_multiple), 1)
        reg_depth = max(round(self.reg_fmap_depth), 1)
        cls_depth = max(round(self.cls_fmap_depth), 1)
        stem = ConvBNorm(stem_out, kernel_size=3, stride=1, dtype=self.dtype, name="stem_layer")(x, train)

        reg = stem
        for i in range(reg_depth + 1):  # reference uses range(0, reg_fmap_depth+1)
            reg = ConvBNorm(stem_out, 3, 1, dtype=self.dtype, name=f"regression_fmap_layer_{i}")(reg, train)
        cls_f = stem
        for i in range(cls_depth):
            cls_f = ConvBNorm(stem_out, 3, 1, dtype=self.dtype, name=f"classification_fmap_layer_{i}")(cls_f, train)

        conv1x1 = lambda c, name: nn.Conv(  # noqa: E731
            c, kernel_size=(1, 1), dtype=self.dtype, name=name
        )
        conf = conv1x1(self.num_anchors, "conf_layer")(reg)
        bbox = conv1x1(self.num_anchors * 4, "bbox_layer")(reg)
        cls = conv1x1(self.num_anchors * self.num_classes, "cls_layer")(cls_f)

        def _reshape(t, last_dim):
            return t.reshape(n, ny, nx, self.num_anchors, last_dim)

        parts = [_reshape(conf, 1), _reshape(cls, self.num_classes), _reshape(bbox, 4)]
        fields = {"conf": conf, "cls": cls, "bbox": bbox}

        if self.num_masks:
            m_depth = max(round(self.masks_fmap_depth or 1), 1)
            m = stem
            for i in range(m_depth):
                m = ConvBNorm(stem_out, 3, 1, dtype=self.dtype, name=f"mask_fmap_layer_{i}")(m, train)
            masks = conv1x1(self.num_anchors * self.num_masks, "masks_layer")(m)
            parts.append(_reshape(masks, self.num_masks))
            fields["masks"] = masks

        if self.num_keypoints:
            kp_depth = max(round(self.keypoints_fmap_depth or 1), 1)
            kpf = stem
            for i in range(kp_depth):
                kpf = ConvBNorm(stem_out, 3, 1, dtype=self.dtype, name=f"keypoints_fmap_layer_{i}")(kpf, train)
            kp = conv1x1(self.num_anchors * 5 * self.num_keypoints, "keypoints_layer")(kpf)
            parts.append(_reshape(kp, 5 * self.num_keypoints))
            fields["keypoints"] = kp

        if raw_fields:
            # serve-fast path: per-field channels-last maps, no (A, D)
            # reshape — the tiny (3, 7) minor dims that reshape creates pad
            # TPU (8, 128) vector tiles to ~2% utilization and dominate the
            # decode cost (see ops/serve_decode.py)
            return fields
        return jnp.concatenate(parts, axis=-1)


class BasicHead(nn.Module):
    """Single 1x1-conv head (reference common.py:934-966)."""

    num_classes: int
    num_anchors: int = 3
    num_masks: Optional[int] = None
    num_keypoints: Optional[int] = None
    width_multiple: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 raw_fields: bool = False):
        n, ny, nx, cin = x.shape
        stem_out = max(round(cin * self.width_multiple), 1)
        out = ConvBNorm(stem_out, kernel_size=3, stride=1, dtype=self.dtype, name="stem_layer")(x, train)
        out_channels = self.num_anchors * (
            5 + self.num_classes + (self.num_masks or 0) + (self.num_keypoints or 0) * 5
        )
        out = nn.Conv(out_channels, kernel_size=(1, 1), dtype=self.dtype, name="conv")(out)
        if raw_fields:
            # channels-last (B, ny, nx, A*D) with anchor-major packing; the
            # serve-fast decode un-packs it in a lanes-major layout
            return {"packed": out}
        out = out.reshape(n, ny, nx, self.num_anchors, -1)
        # reference layout is conf|cls|bbox|masks|kp via separate convs in
        # EffiDecHead; BasicHead leaves the split to the same slicing order.
        return out
