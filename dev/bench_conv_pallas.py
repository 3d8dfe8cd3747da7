"""Microbench: Pallas fused conv3x3+bias+SiLU vs XLA conv + standalone SiLU.

Hot deploy-form shapes for the flagship 640x640 detector at width 0.5
(RepVGG-fused single 3x3 convs; see nn/backbones.py, nn/necks.py).
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from vision_conglomerate_tpu.ops.conv_pallas import conv3x3_bias_act  # noqa: E402

SHAPES = [
    # (batch, H, W, Cin, Cout)
    (32, 160, 160, 64, 64),
    (32, 80, 80, 128, 128),
    (32, 40, 40, 256, 256),
    (32, 80, 80, 128, 64),   # neck lateral
]
ITERS = 20


@jax.jit
def xla_conv_silu(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b
    y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def timed(fn, *args):
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1000


def main():
    for n, h, w_, cin, cout in SHAPES:
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        x = (jax.random.normal(k1, (n, h, w_, cin)) * 0.5).astype(jnp.bfloat16)
        w = (jax.random.normal(k2, (3, 3, cin, cout)) * 0.05).astype(jnp.bfloat16)
        b = (jax.random.normal(k3, (cout,)) * 0.1).astype(jnp.bfloat16)

        y_ref = xla_conv_silu(x, w, b)
        y_pl = conv3x3_bias_act(x, w, b, activation="silu")
        err = float(jnp.abs(y_pl.astype(jnp.float32) - y_ref.astype(jnp.float32)).max())

        ms_xla = timed(xla_conv_silu, x, w, b)
        ms_pl = timed(lambda a, bb, cc: conv3x3_bias_act(a, bb, cc, activation="silu"),
                      x, w, b)
        gflop = 2 * n * h * w_ * cin * cout * 9 / 1e9
        print(f"B{n} {h}x{w_} {cin}->{cout}: xla {ms_xla:7.3f} ms "
              f"({gflop / ms_xla:6.1f} TF/s)  pallas {ms_pl:7.3f} ms "
              f"({gflop / ms_pl:6.1f} TF/s)  speedup {ms_xla / ms_pl:5.2f}x  "
              f"err {err:.2e}")


if __name__ == "__main__":
    main()
