"""De-risk int8 serving: is an int8 conv (int32 accum) actually ~2x the bf16
conv on v5e (394 int8 TOPS vs 197 bf16 TFLOP/s)?

The timed loop CHAINS each iteration's output into the next input (same
shape/dtype), so no iteration can be elided, cached, or overlapped past its
data dependency — an earlier unchained version reported impossible numbers
(2800 TF/s) on the tunneled runtime.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

SHAPES = [
    (32, 160, 160, 64, 64),
    (32, 80, 80, 128, 128),
    (32, 40, 40, 256, 256),
]
ITERS = 20
DN = ("NHWC", "HWIO", "NHWC")


def timed_chained(step, x0):
    """step: x -> x' (same shape/dtype). Returns ms/iter with a real chain."""
    step_j = jax.jit(step)
    x = step_j(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        x = step_j(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / ITERS * 1000


def main():
    for n, h, w_, cin, cout in SHAPES:
        assert cin == cout, "chaining needs cin == cout"
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        x = (jax.random.normal(k1, (n, h, w_, cin)) * 0.5).astype(jnp.bfloat16)
        w = (jax.random.normal(k2, (3, 3, cin, cout)) * 0.05).astype(jnp.bfloat16)
        b = (jax.random.normal(k3, (cout,)) * 0.1).astype(jnp.float32)
        w_scale = jnp.abs(w.astype(jnp.float32)).max(axis=(0, 1, 2)) / 127.0
        w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / w_scale), -127, 127
                       ).astype(jnp.int8)
        x_scale = jnp.float32(3.0 / 127.0)

        def bf16_step(t):
            y = jax.lax.conv_general_dilated(
                t, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN,
                preferred_element_type=jnp.float32) + b
            return (jnp.tanh(y) * 0.5).astype(jnp.bfloat16)  # bounded chain

        def int8_step(t):
            t_q = jnp.clip(jnp.round(t.astype(jnp.float32) / x_scale),
                           -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                t_q, w_q, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN,
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (w_scale * x_scale) + b
            return (jnp.tanh(y) * 0.5).astype(jnp.bfloat16)

        ms_bf = timed_chained(bf16_step, x)
        ms_i8 = timed_chained(int8_step, x)
        gflop = 2 * n * h * w_ * cin * cout * 9 / 1e9
        print(f"B{n} {h}x{w_} {cin}->{cout}: bf16 {ms_bf:6.3f} ms "
              f"({gflop / ms_bf:6.1f} TF/s) | int8 {ms_i8:6.3f} ms "
              f"({gflop / ms_i8:6.1f} TF/s) | {ms_bf / ms_i8:4.2f}x")


if __name__ == "__main__":
    main()
