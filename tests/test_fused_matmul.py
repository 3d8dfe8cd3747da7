"""Fused Pallas matmul+bias+activation kernel: numerics + model integration."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_conglomerate_tpu.ops.fused_matmul import matmul_bias_act, pointwise_conv_act


@pytest.mark.parametrize("m,k,n", [(256, 64, 32), (100, 16, 8), (1025, 128, 128)])
def test_matmul_bias_silu_matches_xla(m, k, n):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(m, k)).astype(np.float32)
    w = rng.normal(size=(k, n)).astype(np.float32)
    b = rng.normal(size=(n,)).astype(np.float32)
    ref = jax.nn.silu(x @ w + b)
    out = matmul_bias_act(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), "silu",
                          block_m=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_matmul_bias_no_act():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(64, 32)).astype(np.float32)
    w = rng.normal(size=(32, 16)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    out = matmul_bias_act(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), None)
    np.testing.assert_allclose(np.asarray(out), x @ w + b, atol=1e-4, rtol=1e-4)


def test_pointwise_conv_act_matches_lax_conv():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    kern = rng.normal(size=(1, 1, 16, 24)).astype(np.float32)
    b = rng.normal(size=(24,)).astype(np.float32)
    ref = jax.nn.silu(jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(kern), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b)
    out = pointwise_conv_act(jnp.asarray(x), jnp.asarray(kern), jnp.asarray(b), "silu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_deploy_with_fused_pointwise_equivalence():
    """Full DetectionNet deploy forward: fused-pointwise mode == plain folded."""
    from tests.test_reparam_model import ANCHORS, CONFIG, _train_some
    from vision_conglomerate_tpu.models import DetectionNet
    from vision_conglomerate_tpu.nn.blocks import bn_folding, fused_pointwise
    from vision_conglomerate_tpu.nn.reparam import deploy_transform

    model = DetectionNet(num_classes=2, config=CONFIG, anchors=ANCHORS)
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    variables = _train_some(model, variables, x)
    dp, ds = deploy_transform(variables["params"], variables["batch_stats"])
    deploy = DetectionNet(num_classes=2, config=CONFIG, anchors=ANCHORS, deploy=True)
    dv = {"params": dp}
    if ds:
        dv["batch_stats"] = ds
    with bn_folding():
        y_plain = deploy.apply(dv, x, train=False, inference=True)
    with bn_folding(), fused_pointwise():
        y_fused = deploy.apply(dv, x, train=False, inference=True)
    np.testing.assert_allclose(
        np.asarray(y_plain), np.asarray(y_fused), atol=2e-3, rtol=1e-3)
