"""Pallas TPU kernel: fused matmul + bias + activation.

Motivation (docs/PERF.md): XLA:TPU cannot fuse elementwise epilogues *into*
convolution ops, so every SiLU after a conv is a separate HBM round trip
over the feature map — measured at ~45% of serving step time. A 1x1
convolution IS a matmul over (B*H*W, Cin) x (Cin, Cout), and this kernel
computes matmul -> +bias -> activation in ONE pass: the activation runs on
the MXU output tile while it is still in VMEM, so the feature map crosses
HBM exactly once.

Used by ConvBNorm for 1x1/stride-1 convs in BN-folded deploy mode (the conv
carries a bias there); enable with `nn.blocks.fused_pointwise(True)` or the
VCT_FUSED_POINTWISE=1 env var. Numerics: bf16 in/out, f32 accumulation
(preferred_element_type), f32 epilogue.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, o_ref, *, activation: Optional[str]):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    if activation == "silu":
        acc = acc * jax.nn.sigmoid(acc)
    elif activation == "relu":
        acc = jnp.maximum(acc, 0.0)
    elif activation is not None:
        raise ValueError(f"unsupported activation {activation!r}")
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("activation", "block_m", "interpret"))
def matmul_bias_act(
    x: jnp.ndarray,        # (M, K)
    w: jnp.ndarray,        # (K, N)
    b: jnp.ndarray,        # (N,)
    activation: Optional[str] = "silu",
    block_m: int = 1024,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """One-pass (x @ w + b) -> activation; returns (M, N) in x.dtype."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    m, k = x.shape
    n = w.shape[1]
    bm = min(block_m, m)
    pad_m = (-m) % bm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    mp = m + pad_m

    out = pl.pallas_call(
        functools.partial(_kernel, activation=activation),
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        interpret=interpret,
    )(x, w, b.reshape(1, n))
    return out[:m]


def pointwise_conv_act(
    x: jnp.ndarray,        # (B, H, W, Cin) NHWC
    kernel: jnp.ndarray,   # (1, 1, Cin, Cout)
    bias: jnp.ndarray,     # (Cout,)
    activation: Optional[str] = "silu",
) -> jnp.ndarray:
    """Fused 1x1 conv + bias + activation via the matmul kernel."""
    b_, h, w_, cin = x.shape
    cout = kernel.shape[-1]
    y = matmul_bias_act(
        x.reshape(b_ * h * w_, cin), kernel.reshape(cin, cout), bias,
        activation=activation)
    return y.reshape(b_, h, w_, cout)
