"""Fused conv3x3+bias+act Pallas kernel: equivalence vs lax conv (interpret
mode on CPU; the TPU perf comparison lives in dev/bench_conv_pallas.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_conglomerate_tpu.ops.conv_pallas import (
    conv3x3_bias_act,
    fused_conv_supported,
)


def _ref(x, w, b, activation):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b
    if activation == "silu":
        y = y * jax.nn.sigmoid(y)
    elif activation == "relu":
        y = jnp.maximum(y, 0.0)
    return y


@pytest.mark.parametrize("shape", [
    (2, 16, 16, 8, 16),   # multi-chunk
    (1, 8, 8, 8, 8),      # single chunk
    (2, 48, 24, 16, 8),   # tall
])
@pytest.mark.parametrize("activation", ["silu", "relu", None])
def test_conv3x3_matches_lax(shape, activation):
    n, h, w_, cin, cout = shape
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (n, h, w_, cin), jnp.float32)
    w = jax.random.normal(k2, (3, 3, cin, cout), jnp.float32) * 0.1
    b = jax.random.normal(k3, (cout,), jnp.float32)
    y = conv3x3_bias_act(x, w, b, activation=activation, interpret=True)
    ref = _ref(x, w, b, activation)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_supported_predicate():
    assert fused_conv_supported(160, 160, 64, 64)
    assert fused_conv_supported(80, 80, 128, 128)
    assert not fused_conv_supported(80, 80, 128, 128, stride=(2, 2))
    assert not fused_conv_supported(80, 80, 130, 128)  # cin % 8
    assert not fused_conv_supported(2, 80, 64, 64)     # too short
