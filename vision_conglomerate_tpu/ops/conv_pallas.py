"""Fused 3x3 conv + bias + activation Pallas TPU kernel (stride 1, SAME).

Targets the serve-path loss the round-1 trace identified: XLA:TPU cannot
fuse elementwise epilogues INTO convolutions, so every deploy-form RepVGG
3x3 conv (reference common.py:8-51, 137-229 — fused at deploy by
nn/reparam.py) is followed by a standalone SiLU pass, an extra HBM round
trip over the full feature map (docs/PERF.md). This kernel owns the conv
itself and applies bias + activation in VMEM before the single HBM write.

Design (grid = (batch, row_chunks)):
- the input rides in three row-chunk views (prev/cur/next) of the same
  array so each step sees its halo rows without overlapping blocks or
  whole-image VMEM residency; Pallas double-buffers the chunk-sized blocks
  and pipelines HBM loads against compute;
- each step assembles a zero-padded (chunk+2, W+2, Cin) window in VMEM
  scratch, then runs the 3x3 conv as 9 shifted (chunk*W, Cin) @ (Cin, Cout)
  MXU matmuls accumulated in f32;
- bias + activation (SiLU/ReLU) run on the f32 accumulator in VMEM, then
  one bf16 store per chunk.

Constraints: stride 1, padding 1, Cin/Cout multiples of 8. Check
fused_conv_supported() before calling.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row-chunk f32 accumulator budget (bytes); bounds chunk * W * Cout * 4
# (keeps the whole kernel under the 16 MB scoped-VMEM ceiling with the
# double-buffered prev/cur/next blocks)
_MAX_ACC_BYTES = 768 * 1024


def fused_conv_supported(h: int, w: int, cin: int, cout: int,
                         stride=(1, 1), kernel=(3, 3)) -> bool:
    if tuple(stride) != (1, 1) or tuple(kernel) != (3, 3):
        return False
    if cin % 8 or cout % 8:
        return False
    return h >= 4 and w * cout * 4 * 4 <= _MAX_ACC_BYTES  # chunk >= 4 fits


def _apply_act(y: jnp.ndarray, activation: Optional[str]) -> jnp.ndarray:
    if activation == "silu":
        return y * jax.nn.sigmoid(y)
    if activation == "relu":
        return jnp.maximum(y, 0.0)
    if activation in (None, "none"):
        return y
    raise ValueError(f"unsupported fused activation: {activation}")


def _conv3x3_kernel(prev_ref, cur_ref, next_ref, w_ref, b_ref, out_ref, halo,
                    *, activation: str, chunk: int):
    """One (image, row-chunk) step: halo assembly + 9-tap MXU accumulation."""
    w_dim, cin = cur_ref.shape[2], cur_ref.shape[3]
    cout = out_ref.shape[3]
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    # --- assemble the zero-padded (chunk+2, W+2, Cin) window
    halo[:] = jnp.zeros_like(halo)
    halo[1:chunk + 1, 1:w_dim + 1, :] = cur_ref[0]

    @pl.when(c > 0)
    def _():
        halo[0:1, 1:w_dim + 1, :] = prev_ref[0, chunk - 1: chunk]

    @pl.when(c < n_chunks - 1)
    def _():
        halo[chunk + 1: chunk + 2, 1:w_dim + 1, :] = next_ref[0, 0:1]

    # --- 9 shifted MXU matmuls, f32 accumulation
    bias = b_ref[0].astype(jnp.float32)
    acc = jnp.zeros((chunk * w_dim, cout), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            patch = halo[ky: ky + chunk, kx: kx + w_dim, :]
            acc = acc + jnp.dot(
                patch.reshape(chunk * w_dim, cin),
                w_ref[ky, kx],
                preferred_element_type=jnp.float32,
            )
    y = _apply_act(acc + bias[None, :], activation)
    out_ref[0] = y.reshape(chunk, w_dim, cout).astype(out_ref.dtype)


def _pick_chunk(h: int, w: int, cout: int) -> int:
    for c in (32, 16, 8, 4, 2):
        if h % c == 0 and c * w * cout * 4 <= _MAX_ACC_BYTES:
            return c
    return h


@functools.partial(
    jax.jit, static_argnames=("activation", "out_dtype", "interpret"))
def conv3x3_bias_act(
    x: jnp.ndarray,       # (N, H, W, Cin)
    w: jnp.ndarray,       # (3, 3, Cin, Cout)
    b: jnp.ndarray,       # (Cout,)
    activation: Optional[str] = "silu",
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    n, h, w_dim, cin = x.shape
    cout = w.shape[-1]
    out_dtype = out_dtype or x.dtype
    chunk = _pick_chunk(h, w_dim, cout)
    n_chunks = h // chunk

    kernel = functools.partial(
        _conv3x3_kernel, activation=activation, chunk=chunk)
    flops = 2 * n * h * w_dim * cin * cout * 9
    chunk_spec = lambda f: pl.BlockSpec(  # noqa: E731
        (1, chunk, w_dim, cin), f, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w_dim, cout), out_dtype),
        grid=(n, n_chunks),
        in_specs=[
            # prev / cur / next row-chunk views (clamped at the edges; the
            # kernel masks the out-of-range halo rows to zero)
            chunk_spec(lambda i, c: (i, jnp.maximum(c - 1, 0), 0, 0)),
            chunk_spec(lambda i, c: (i, c, 0, 0)),
            chunk_spec(lambda i, c: (i, jnp.minimum(c + 1, h // chunk - 1), 0, 0)),
            pl.BlockSpec((3, 3, cin, cout), lambda i, c: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, w_dim, cout),
                               lambda i, c: (i, c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((chunk + 2, w_dim + 2, cin), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size + w.size) * 2 + n * h * w_dim * cout * 2,
            transcendentals=n * h * w_dim * cout if activation == "silu" else 0,
        ),
        interpret=interpret,
    )(x, x, x, w, b.reshape(1, cout))
