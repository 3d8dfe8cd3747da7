"""int8 PTQ serving path (nn/quantize.py): calibration sow, transform
structure, end-to-end apply accuracy vs the f32 deploy form."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_conglomerate_tpu.models import DetectionNet
from vision_conglomerate_tpu.nn.blocks import bn_folding
from vision_conglomerate_tpu.nn.quantize import (
    collect_calibration,
    int8_quantize_params,
    int8_serving,
)
from vision_conglomerate_tpu.nn.reparam import deploy_transform

CONFIG = {
    "train_anchors": True,
    "backbone": "CSPBackBone",
    "neck": "RepBiPAN",
    "head": "EffiDecHead",
    "cspbackbone_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
    "repbipan_config": {"width_multiple": 0.25, "depth_multiple": 0.2,
                        "repvgg_branch_act": None},
    "effidechead_config": {"width_multiple": 0.5},
}
ANCHORS = {
    "sm": [[0.1, 0.1], [0.15, 0.15], [0.2, 0.2]],
    "md": [[0.25, 0.25], [0.3, 0.3], [0.35, 0.35]],
    "lg": [[0.4, 0.4], [0.5, 0.5], [0.6, 0.6]],
}


@pytest.fixture(scope="module")
def deploy_setup():
    model = DetectionNet(num_classes=2, config=CONFIG, anchors=ANCHORS)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    dp, ds = deploy_transform(v["params"], v["batch_stats"], fuse_repvgg=True)
    deploy = DetectionNet(num_classes=2, config=CONFIG, anchors=ANCHORS,
                          deploy=True)
    dv = {"params": dp}
    if ds:
        dv["batch_stats"] = ds
    return deploy, dv, x


def test_calibration_covers_every_folded_conv(deploy_setup):
    deploy, dv, x = deploy_setup
    absmax = collect_calibration(deploy, dv, [x], inference=True)
    leaves = jax.tree_util.tree_leaves(absmax)
    assert len(leaves) > 20
    assert all(float(np.asarray(v)) > 0 for v in leaves)


def test_quantize_params_structure(deploy_setup):
    deploy, dv, x = deploy_setup
    absmax = collect_calibration(deploy, dv, [x], inference=True)
    qp = int8_quantize_params(dv["params"], absmax)
    flat = jax.tree_util.tree_leaves_with_path(qp)
    q_kernels = [v for p, v in flat if "q_kernel" in str(p)]
    n_cal = len(jax.tree_util.tree_leaves(absmax))
    assert len(q_kernels) == n_cal
    assert all(k.dtype == jnp.int8 for k in q_kernels)
    # the f32 conv children of quantized nodes are gone; heads stay f32
    names = [str(p) for p, _ in flat]
    assert any("conf_layer" in n and "kernel" in n for n in names)
    # anchors survive untouched
    assert "sm_anchors" in qp


def test_int8_apply_matches_f32_deploy(deploy_setup):
    deploy, dv, x = deploy_setup
    with bn_folding():
        y_ref = deploy.apply(dv, x, train=False, inference=True)
    absmax = collect_calibration(deploy, dv, [x], inference=True)
    qv = dict(dv)
    qv["params"] = int8_quantize_params(dv["params"], absmax)
    with bn_folding(), int8_serving():
        y_q = deploy.apply(qv, x, train=False, inference=True)
    ref = np.asarray(y_ref, np.float32)
    got = np.asarray(y_q, np.float32)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02, rel


def test_int8_without_qparams_is_normal_path(deploy_setup):
    """int8_serving() with un-quantized params must fall through to the f32
    path (mixed precision / non-calibrated modules)."""
    deploy, dv, x = deploy_setup
    with bn_folding():
        y_ref = deploy.apply(dv, x, train=False, inference=True)
    with bn_folding(), int8_serving():
        y = deploy.apply(dv, x, train=False, inference=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref))
