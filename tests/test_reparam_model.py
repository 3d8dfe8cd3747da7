"""Whole-model RepVGG reparameterization equivalence (train form vs deploy
form) for DetectionNet and the advanced TrackNet."""
import numpy as np

import jax
import jax.numpy as jnp

from vision_conglomerate_tpu.models import DetectionNet, TrackNet
from vision_conglomerate_tpu.nn.reparam import reparameterize_params

CONFIG = {
    "train_anchors": True,
    "backbone": "CSPBackBone",
    "neck": "RepBiPAN",
    "head": "EffiDecHead",
    "cspbackbone_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
    "repbipan_config": {"width_multiple": 0.25, "depth_multiple": 0.2,
                        "repvgg_branch_act": None},  # canonical: fully fusable
    "effidechead_config": {"width_multiple": 0.5},
}

ANCHORS = {
    "sm": [[0.1, 0.1], [0.15, 0.15], [0.2, 0.2]],
    "md": [[0.25, 0.25], [0.3, 0.3], [0.35, 0.35]],
    "lg": [[0.4, 0.4], [0.5, 0.5], [0.6, 0.6]],
}


def _train_some(model, variables, x, n=2):
    """Run a couple of train steps so BN stats are non-trivial."""
    vars_mut = variables
    for i in range(n):
        xi = jax.random.normal(jax.random.PRNGKey(10 + i), x.shape) * 0.5 + 0.5
        _, updates = model.apply(vars_mut, xi, train=True, mutable=["batch_stats"])
        vars_mut = {"params": vars_mut["params"], "batch_stats": updates["batch_stats"]}
    return vars_mut


def test_detection_net_reparam_equivalence():
    model = DetectionNet(num_classes=2, config=CONFIG, anchors=ANCHORS)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    variables = _train_some(model, variables, x)

    y_train_form = model.apply(variables, x, train=False, inference=True)

    dp, ds = reparameterize_params(variables["params"], variables["batch_stats"])
    deploy = DetectionNet(num_classes=2, config=CONFIG, anchors=ANCHORS, deploy=True)
    dv = {"params": dp}
    if ds:
        dv["batch_stats"] = ds
    y_deploy = deploy.apply(dv, x, train=False, inference=True)
    np.testing.assert_allclose(
        np.asarray(y_train_form), np.asarray(y_deploy), atol=2e-3, rtol=1e-3)


def test_detection_net_full_bn_folding_equivalence():
    """deploy_transform (RepVGG fusion + global conv-BN folding) ==
    train-form eval outputs."""
    from vision_conglomerate_tpu.nn.blocks import bn_folding
    from vision_conglomerate_tpu.nn.reparam import deploy_transform

    model = DetectionNet(num_classes=2, config=CONFIG, anchors=ANCHORS)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    variables = _train_some(model, variables, x)
    y_ref = model.apply(variables, x, train=False, inference=True)

    dp, ds = deploy_transform(variables["params"], variables["batch_stats"])
    deploy = DetectionNet(num_classes=2, config=CONFIG, anchors=ANCHORS, deploy=True)
    dv = {"params": dp}
    if ds:
        dv["batch_stats"] = ds
    with bn_folding():
        y = deploy.apply(dv, x, train=False, inference=True)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y), atol=2e-3, rtol=1e-3)


def test_reference_parity_mode_bn_folding_equivalence():
    """With reference-parity branch activations (default), full RepVGG fusion
    is impossible (the reference's own toggle_inference_mode silently changes
    the function); deploy = BN folding only, train-form module structure."""
    from vision_conglomerate_tpu.nn.blocks import bn_folding
    from vision_conglomerate_tpu.nn.reparam import deploy_transform

    cfg = dict(CONFIG)
    cfg["repbipan_config"] = {"width_multiple": 0.25, "depth_multiple": 0.2}  # default silu
    model = DetectionNet(num_classes=2, config=cfg, anchors=ANCHORS)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    variables = _train_some(model, variables, x)
    y_ref = model.apply(variables, x, train=False, inference=True)

    dp, ds = deploy_transform(variables["params"], variables["batch_stats"],
                              fuse_repvgg=False)
    dv = {"params": dp}
    if ds:
        dv["batch_stats"] = ds
    with bn_folding():
        y = model.apply(dv, x, train=False, inference=True)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y), atol=2e-3, rtol=1e-3)


def test_tracknet_advanced_reparam_equivalence():
    cfg = {
        "weight_init": "xavier",
        "architecture": "advanced",
        "advanced_arch_config": {
            "encoder_modules": ["CSPNet", "RepBiPAN"],
            "decoder_modules": ["DeconvRepBiPAN", "DeconvCSPNet"],
            "encoder_config": {
                "cspnet_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
                "repbipan_config": {"width_multiple": 0.25, "depth_multiple": 0.2,
                                    "repvgg_branch_act": None},
            },
            "decoder_config": {
                "deconvrepbipan_config": {"width_multiple": 0.25, "depth_multiple": 0.2,
                                          "repvgg_branch_act": None},
                "deconvcspnet_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
            },
        },
    }
    model = TrackNet(config=cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 64, 9))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    variables = _train_some(model, variables, x)
    y_train_form = model.apply(variables, x, train=False)

    dp, ds = reparameterize_params(variables["params"], variables["batch_stats"])
    deploy = TrackNet(config=cfg, deploy=True)
    dv = {"params": dp}
    if ds:
        dv["batch_stats"] = ds
    y_deploy = deploy.apply(dv, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_train_form), np.asarray(y_deploy), atol=2e-3, rtol=1e-3)
