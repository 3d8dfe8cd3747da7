"""`remat` (stage-granular rematerialization, nn/blocks.maybe_remat) must be
a pure runtime knob: identical variable tree, forward outputs, batch_stats
updates and gradients vs the non-remat model — only the backward-pass memory
profile changes. Covers DetectionNet (model_config.remat) and both TrackNet
archs (config.remat)."""
import numpy as np

import jax
import jax.numpy as jnp

from vision_conglomerate_tpu.models import DetectionNet, TrackNet

CONFIG = {
    "train_anchors": True,
    "backbone": "CSPBackBone",
    "neck": "RepBiPAN",
    "head": "EffiDecHead",
    "cspbackbone_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
    "repbipan_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
    "effidechead_config": {"width_multiple": 0.5},
}

ANCHORS = {
    "sm": [[0.1, 0.1], [0.15, 0.15], [0.2, 0.2]],
    "md": [[0.25, 0.25], [0.3, 0.3], [0.35, 0.35]],
    "lg": [[0.4, 0.4], [0.5, 0.5], [0.6, 0.6]],
}


def _tree_allclose(a, b, atol=1e-6):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def _check_pair(plain_model, remat_model, x, train_kwargs):
    v0 = plain_model.init(jax.random.PRNGKey(0), x, train=True)
    v1 = remat_model.init(jax.random.PRNGKey(0), x, train=True)
    assert (jax.tree_util.tree_structure(v0)
            == jax.tree_util.tree_structure(v1)), "variable tree must not change"
    _tree_allclose(v0, v1)

    def loss(v, model):
        out, mut = model.apply(v, x, train=True, mutable=["batch_stats"],
                               **train_kwargs)
        tot = sum(jnp.square(o.astype(jnp.float32)).mean()
                  for o in jax.tree_util.tree_leaves(out))
        return tot, mut["batch_stats"]

    (l0, bs0), g0 = jax.value_and_grad(loss, has_aux=True)(v0, plain_model)
    (l1, bs1), g1 = jax.value_and_grad(loss, has_aux=True)(v1, remat_model)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-6)
    _tree_allclose(bs0, bs1)
    _tree_allclose(g0, g1, atol=1e-5)


def test_detection_remat_transparent():
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    plain = DetectionNet(num_classes=2, config=CONFIG, anchors=ANCHORS)
    remat = DetectionNet(num_classes=2, config={**CONFIG, "remat": True},
                         anchors=ANCHORS)
    _check_pair(plain, remat, x, {})


def test_tracknet_base_remat_transparent():
    cfg = {"architecture": "base",
           "base_arch_config": {"encoder_config": {"width_multiple": 0.25},
                                "decoder_config": {"width_multiple": 0.25}}}
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 9))
    _check_pair(TrackNet(config=cfg),
                TrackNet(config={**cfg, "remat": True}), x, {})


def test_tracknet_advanced_remat_transparent():
    cfg = {
        "architecture": "advanced",
        "advanced_arch_config": {
            "encoder_modules": ["CSPNet", "RepBiPAN"],
            "decoder_modules": ["DeconvRepBiPAN", "DeconvCSPNet"],
            "encoder_config": {
                "cspnet_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
                "repbipan_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
            },
            "decoder_config": {
                "deconvrepbipan_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
                "deconvcspnet_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
            },
        },
    }
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 9))
    _check_pair(TrackNet(config=cfg),
                TrackNet(config={**cfg, "remat": True}), x, {})


def test_resolve_remat_default_batch_knee():
    """Train CLIs auto-enable remat at batch >= 32 (measured knee,
    docs/PERF.md); explicit YAML true/false wins; the decision is recorded
    in the config dict so saved config copies carry it."""
    from vision_conglomerate_tpu.train import resolve_remat_default

    assert resolve_remat_default({}, 16)["remat"] is False
    assert resolve_remat_default({}, 32)["remat"] is True
    assert resolve_remat_default({"remat": None}, 128)["remat"] is True
    assert resolve_remat_default({"remat": False}, 128)["remat"] is False
    assert resolve_remat_default({"remat": True}, 4)["remat"] is True
