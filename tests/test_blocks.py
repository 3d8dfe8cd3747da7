"""Shape and semantics unit tests for the block zoo (SURVEY.md §4a)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_conglomerate_tpu.nn import blocks
from vision_conglomerate_tpu.nn.backbones import CSPNet, ResNetBackBone, cspnet_out_channels
from vision_conglomerate_tpu.nn.necks import (
    BiPAN,
    DeconvRepBiPAN,
    RepBiPAN,
    bipan_out_channels,
    deconv_repbipan_out_channels,
    repbipan_out_channels,
)
from vision_conglomerate_tpu.nn.reparam import reparameterize_params

KEY = jax.random.PRNGKey(0)


def _init_apply(mod, *args, train=False, method=None):
    variables = mod.init(KEY, *args, train=train)
    out = mod.apply(variables, *args, train=train)
    return variables, out


def test_conv_bnorm_shape():
    x = jnp.ones((2, 16, 16, 8))
    mod = blocks.ConvBNorm(24, kernel_size=3, stride=2)
    _, y = _init_apply(mod, x)
    assert y.shape == (2, 8, 8, 24)


def test_conv_bnorm_stem6x6():
    # CSPNet stem: k=6, s=2, p=2 -> out = floor((H+2*2-6)/2)+1 = H/2
    x = jnp.ones((1, 64, 64, 3))
    mod = blocks.ConvBNorm(16, kernel_size=6, stride=2, padding=2)
    _, y = _init_apply(mod, x)
    assert y.shape == (1, 32, 32, 16)


def test_repvgg_block_train_shape():
    x = jnp.ones((2, 8, 8, 16))
    mod = blocks.RepVGGBlock(16, 16)
    variables, y = _init_apply(mod, x)
    assert y.shape == (2, 8, 8, 16)
    assert "identity" in variables["params"]  # stride 1, cin == cout


def test_repvgg_reparam_equivalence():
    """fused(x) == branches(x) in eval mode — the RepVGG identity."""
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    mod = blocks.RepVGGBlock(16, 16, branch_activation=None)  # canonical
    variables = mod.init(KEY, x, train=False)
    # run a few train steps so batch_stats are non-trivial
    vars_mut = variables
    for i in range(3):
        xi = jax.random.normal(jax.random.PRNGKey(2 + i), (4, 8, 8, 16)) * (i + 1)
        _, updates = mod.apply(vars_mut, xi, train=True, mutable=["batch_stats"])
        vars_mut = {"params": vars_mut["params"], "batch_stats": updates["batch_stats"]}

    y_train_form = mod.apply(vars_mut, x, train=False)

    dp, ds = reparameterize_params(vars_mut["params"], vars_mut["batch_stats"])
    deploy_mod = blocks.RepVGGBlock(16, 16, branch_activation=None, deploy=True)
    deploy_vars = {"params": dp}
    if ds:
        deploy_vars["batch_stats"] = ds
    y_deploy = deploy_mod.apply(deploy_vars, x, train=False)
    np.testing.assert_allclose(np.asarray(y_train_form), np.asarray(y_deploy), atol=1e-4)


def test_repvgg_reparam_stride2_no_identity():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
    mod = blocks.RepVGGBlock(8, 24, stride=2, branch_activation=None)
    variables = mod.init(KEY, x, train=False)
    assert "identity" not in variables["params"]
    y = mod.apply(variables, x, train=False)
    dp, ds = reparameterize_params(variables["params"], variables["batch_stats"])
    y2 = blocks.RepVGGBlock(8, 24, stride=2, branch_activation=None, deploy=True).apply({"params": dp}, x, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-4)


@pytest.mark.parametrize("n", [1, 2, 4])
def test_repblock_depths(n):
    x = jnp.ones((1, 8, 8, 16))
    mod = blocks.RepBlock(32, n=n)
    _, y = _init_apply(mod, x)
    assert y.shape == (1, 8, 8, 32)


def test_c3_sppf_cspsppf_shapes():
    x = jnp.ones((2, 16, 16, 32))
    for mod, co in [
        (blocks.C3Module(64, num_bottlenecks=2), 64),
        (blocks.SPPFModule(64), 64),
        (blocks.CSPSPPFModule(64), 64),
    ]:
        _, y = _init_apply(mod, x)
        assert y.shape == (2, 16, 16, co)


def test_sppf_quirk_concat():
    """The reference concatenates [y, p2, p2, p3] (common.py:374-377): two
    maxpools twice + three maxpools, NOT the canonical [y, p1, p2, p3]."""
    x = jax.random.normal(KEY, (1, 8, 8, 8))
    mod = blocks.SPPFModule(16, e=0.5, pool_kernel_size=3)
    variables = mod.init(KEY, x, train=False)

    # manual recomputation of the quirk
    p = variables["params"]

    def convbn(x, sub):
        k = p[sub]["conv"]["kernel"]
        b = p[sub]["conv"]["bias"]
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        bnp = p[sub]["norm"]["BatchNorm_0"]
        bns = variables["batch_stats"][sub]["norm"]["BatchNorm_0"]
        y = (y - bns["mean"]) / jnp.sqrt(bns["var"] + 1e-5) * bnp["scale"] + bnp["bias"]
        return jax.nn.silu(y)

    y = convbn(x, "conv1")
    pool = lambda t: blocks._max_pool_same(t, 3)  # noqa: E731
    p2 = pool(pool(y))
    p3 = pool(p2)
    manual = convbn(jnp.concatenate([y, p2, p2, p3], axis=-1), "conv2")
    out = mod.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(manual), atol=1e-5)


def test_bic_modules():
    c1 = jnp.ones((1, 16, 16, 12))
    c0 = jnp.ones((1, 32, 32, 10))
    p2 = jnp.ones((1, 8, 8, 6))
    mod = blocks.BiCwithNoConvModule()
    variables = mod.init(KEY, c1, c0, p2, train=False)
    y = mod.apply(variables, c1, c0, p2, train=False)
    assert y.shape == (1, 16, 16, 12 + 10 + 6)

    mod2 = blocks.BiCwithConvModule(24)
    variables2 = mod2.init(KEY, c1, c0, p2, train=False)
    y2 = mod2.apply(variables2, c1, c0, p2, train=False)
    assert y2.shape == (1, 16, 16, 24)


def test_cspnet_fmap_shapes_and_channels():
    x = jnp.ones((1, 64, 64, 3))
    mod = CSPNet(width_multiple=0.5, depth_multiple=0.3)
    _, fmaps = _init_apply(mod, x)
    expect = cspnet_out_channels(0.5)
    assert expect == (64, 128, 256, 512)
    strides = (4, 8, 16, 32)
    for fm, c, s in zip(fmaps, expect, strides):
        assert fm.shape == (1, 64 // s, 64 // s, c)


def test_resnet_backbone_shapes():
    x = jnp.ones((1, 64, 64, 3))
    mod = ResNetBackBone(block="BasicBlock", block_layers=(1, 1, 1, 1))
    _, fmaps = _init_apply(mod, x)
    for fm, c, s in zip(fmaps, (64, 128, 256, 512), (4, 4, 8, 16)):
        assert fm.shape[-1] == c


def test_repbipan_shapes():
    wm = 0.5
    cs = cspnet_out_channels(wm)
    fmaps = [jnp.ones((1, 64 // s, 64 // s, c)) for c, s in zip(cs, (4, 8, 16, 32))]
    mod = RepBiPAN(width_multiple=wm)
    variables = mod.init(KEY, fmaps, train=False)
    outs = mod.apply(variables, fmaps, train=False)
    expect = repbipan_out_channels(cs, wm)
    for o, c in zip(outs, expect):
        assert o.shape[-1] == c
    # spatial: c2@4, n3@8, n4@16, n5@32
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]


def test_bipan_shapes():
    wm = 0.5
    cs = cspnet_out_channels(wm)
    fmaps = [jnp.ones((1, 64 // s, 64 // s, c)) for c, s in zip(cs, (4, 8, 16, 32))]
    mod = BiPAN(width_multiple=wm)
    variables = mod.init(KEY, fmaps, train=False)
    outs = mod.apply(variables, fmaps, train=False)
    expect = bipan_out_channels(cs, wm)
    for o, c in zip(outs, expect):
        assert o.shape[-1] == c


def test_deconv_repbipan_shapes():
    wm = 0.5
    cs = cspnet_out_channels(wm)
    in_ch = repbipan_out_channels(cs, wm)
    fmaps = [jnp.ones((1, 64 // s, 64 // s, c)) for c, s in zip(in_ch, (4, 8, 16, 32))]
    mod = DeconvRepBiPAN(width_multiple=wm)
    variables = mod.init(KEY, fmaps, train=False)
    outs = mod.apply(variables, fmaps, train=False)
    expect = deconv_repbipan_out_channels(in_ch, wm)
    for o, c in zip(outs, expect):
        assert o.shape[-1] == c
    assert [o.shape[1] for o in outs] == [2, 4, 8, 16]


def test_effidechead_output_shape():
    x = jnp.ones((2, 8, 8, 32))
    mod = blocks.EffiDecHead(num_classes=4, num_anchors=3, num_masks=8, num_keypoints=2)
    _, y = _init_apply(mod, x)
    assert y.shape == (2, 8, 8, 3, 1 + 4 + 4 + 8 + 10)


def test_basichead_output_shape():
    x = jnp.ones((2, 8, 8, 32))
    mod = blocks.BasicHead(num_classes=4, num_anchors=3)
    _, y = _init_apply(mod, x)
    assert y.shape == (2, 8, 8, 3, 9)


def test_conv_transpose_bnorm_fold_parity_no_bias():
    """use_bias=False ConvTransposeBNorm: folded apply must still consume the
    bias fold_conv_bn_params emits (the folded BN shift) — regression for the
    dropped-bias edge (VERDICT r1 weak #4)."""
    from vision_conglomerate_tpu.nn.blocks import bn_folding
    from vision_conglomerate_tpu.nn.reparam import fold_conv_bn_params

    x = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 12))
    mod = blocks.ConvTransposeBNorm(10, kernel_size=2, stride=2, use_bias=False)
    variables = mod.init(KEY, x, train=False)
    vars_mut = variables
    for i in range(3):
        xi = jax.random.normal(jax.random.PRNGKey(20 + i), x.shape) * (i + 1)
        _, updates = mod.apply(vars_mut, xi, train=True, mutable=["batch_stats"])
        vars_mut = {"params": vars_mut["params"], "batch_stats": updates["batch_stats"]}
    y_ref = mod.apply(vars_mut, x, train=False)

    fp, fs = fold_conv_bn_params(vars_mut["params"], vars_mut["batch_stats"])
    assert "bias" in fp["conv_transpose"]  # the folded shift must survive
    fv = {"params": fp}
    if fs:
        fv["batch_stats"] = fs
    with bn_folding():
        y = mod.apply(fv, x, train=False)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y), atol=1e-5, rtol=1e-5)
