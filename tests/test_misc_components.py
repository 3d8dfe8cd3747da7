"""Coverage for the remaining zoo pieces: ConvTransposeBNorm, DeconvBiPAN,
DeconvCSPNet, registry resolution, corrected crop mode, device prefetch."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_conglomerate_tpu import registry
from vision_conglomerate_tpu.nn import blocks
from vision_conglomerate_tpu.nn.backbones import DeconvCSPNet, cspnet_out_channels
from vision_conglomerate_tpu.nn.necks import (
    DeconvBiPAN,
    bipan_out_channels,
    deconv_bipan_out_channels,
)

KEY = jax.random.PRNGKey(0)


def test_conv_transpose_bnorm_shape():
    x = jnp.ones((1, 8, 8, 4))
    mod = blocks.ConvTransposeBNorm(6, kernel_size=2, stride=2)
    v = mod.init(KEY, x, train=False)
    y = mod.apply(v, x, train=False)
    assert y.shape == (1, 16, 16, 6)  # (i-1)*2 - 0 + 2 = 16 (torch formula)


def test_deconv_bipan_shapes():
    wm = 0.5
    cs = cspnet_out_channels(wm)
    in_ch = bipan_out_channels(cs, wm)
    fmaps = [jnp.ones((1, 64 // s, 64 // s, c)) for c, s in zip(in_ch, (4, 8, 16, 32))]
    mod = DeconvBiPAN(width_multiple=wm)
    v = mod.init(KEY, fmaps, train=False)
    outs = mod.apply(v, fmaps, train=False)
    expect = deconv_bipan_out_channels(in_ch, wm)
    for o, c in zip(outs, expect):
        assert o.shape[-1] == c


def test_deconv_cspnet_full_res_output():
    # feed the DeconvRepBiPAN-style (deep -> shallow) pyramid
    fmaps = [jnp.ones((1, 2, 2, 64)), jnp.ones((1, 4, 4, 48)),
             jnp.ones((1, 8, 8, 32)), jnp.ones((1, 16, 16, 16))]
    mod = DeconvCSPNet(out_channels=10, width_multiple=0.25, depth_multiple=0.2)
    v = mod.init(KEY, fmaps, train=False)
    y = mod.apply(v, fmaps, train=False)
    assert y.shape == (1, 64, 64, 10)  # 5 upsamples from 2 -> 64


def test_registry_resolves_all_reference_names():
    for name in ("CSPBackBone", "CSPNet", "ResNetBackBone"):
        assert registry.resolve(registry.BACKBONES, name).cls is not None
    for name in ("RepBiPAN", "BiPAN", "DeconvRepBiPAN", "DeconvBiPAN"):
        assert registry.resolve(registry.NECKS, name).cls is not None
    for name in ("EffiDecHead", "BasicHead"):
        assert registry.resolve(registry.HEADS, name).cls is not None
    for name in ("CSPNet", "RepBiPAN", "BiPAN", "DeconvRepBiPAN",
                 "DeconvBiPAN", "DeconvCSPNet"):
        assert registry.resolve(registry.TRACKNET_MODULES, name).cls is not None
    with pytest.raises(KeyError):
        registry.resolve(registry.BACKBONES, "NotABackbone")
    # config-key convention
    assert registry.component_config({"cspbackbone_config": {"a": 1}}, "CSPBackBone") == {"a": 1}


def test_corrected_crop_mode_runs():
    from vision_conglomerate_tpu.losses import SegmentationLossConfig
    from vision_conglomerate_tpu.losses.segmentation_loss import seg_scale_loss

    rng = np.random.default_rng(0)
    b, g, a, c, k = 2, 8, 3, 2, 4
    d = 1 + c + 4 + k
    preds = jnp.asarray(rng.normal(size=(b, g, g, a, d)).astype(np.float32))
    labels = np.zeros((b, 4, 5), np.float32)
    labels[:, 0] = [0, 0.5, 0.5, 0.4, 0.4]
    mask = np.zeros((b, 4), bool)
    mask[:, 0] = True
    protos = jnp.asarray(rng.normal(size=(b, 16, 16, k)).astype(np.float32))
    tmasks = np.zeros((b, 16, 16), np.float32)
    tmasks[:, 4:12, 4:12] = 1
    anchors = jnp.asarray([[0.3, 0.3], [0.4, 0.4], [0.5, 0.5]])
    for mode in ("reference", "corrected"):
        cfg = SegmentationLossConfig(
            num_classes=c, seg_candidates_per_image=4, crop_mode=mode)
        losses, metrics = seg_scale_loss(
            preds, jnp.asarray(labels), jnp.asarray(mask), protos,
            jnp.asarray(tmasks), anchors, cfg)
        assert np.isfinite(float(losses["seg"])), mode


def test_prefetch_to_device():
    from vision_conglomerate_tpu.data.loader import prefetch_to_device

    batches = [(np.ones((2, 4)), np.zeros(2)) for _ in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    assert all(isinstance(b[0], jax.Array) for b in out)
    # size=0 must degrade to synchronous per-batch device_put, not drop
    # everything (the A/B baseline arm in dev/bench_prefetch.py), and
    # size > n_batches must still yield every batch exactly once
    for size in (0, 1, 7):
        out = list(prefetch_to_device(iter(batches), size=size))
        assert len(out) == 5, size
        assert all(isinstance(b[0], jax.Array) for b in out), size


def test_prefetch_sharded_ragged_tail_and_host_leaves():
    """A drop_last=False ragged tail whose batch dim is not divisible by the
    mesh must fall back to an unsharded put instead of device_put raising
    (TrackNet eval on --use_ddp), and host_indices leaves must stay numpy
    (the 'others' tensor is consumed host-side only)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from vision_conglomerate_tpu.data.loader import prefetch_to_device

    devs = jax.devices()
    assert len(devs) >= 2
    mesh = Mesh(np.asarray(devs[:2]), ("dp",))
    sharding = NamedSharding(mesh, PartitionSpec("dp"))
    # full batches of 4, ragged tail of 3 (3 % 2 != 0)
    batches = [(np.ones((4, 8)), np.zeros((4, 2)), np.arange(4.0)),
               (np.ones((3, 8)), np.zeros((3, 2)), np.arange(3.0))]
    out = list(prefetch_to_device(iter(batches), size=2, device=sharding,
                                  host_indices=(2,)))
    assert len(out) == 2
    for frames, heatmaps, others in out:
        assert isinstance(frames, jax.Array)
        assert isinstance(heatmaps, jax.Array)
        assert isinstance(others, np.ndarray)  # never shipped
    assert out[0][0].sharding == sharding          # even batch: dp-sharded
    assert out[1][0].shape == (3, 8)               # tail survives intact
    np.testing.assert_array_equal(np.asarray(out[1][2]), np.arange(3.0))


def test_seg_dropped_candidates_metric():
    """A crowded image exceeding seg_candidates_per_image must surface a
    nonzero seg_dropped_candidates metric (VERDICT r1 weak #6)."""
    from vision_conglomerate_tpu.losses import SegmentationLossConfig
    from vision_conglomerate_tpu.losses.segmentation_loss import seg_scale_loss

    rng = np.random.default_rng(1)
    b, g, a, c, k = 1, 8, 3, 2, 4
    d = 1 + c + 4 + k
    preds = jnp.asarray(rng.normal(size=(b, g, g, a, d)).astype(np.float32))
    # 6 well-separated boxes, each assigned to >=1 candidate; cap at 2
    labels = np.zeros((b, 8, 5), np.float32)
    for i in range(6):
        labels[:, i] = [0, 0.125 + 0.125 * i, 0.5, 0.1, 0.1]
    mask = np.zeros((b, 8), bool)
    mask[:, :6] = True
    protos = jnp.asarray(rng.normal(size=(b, 16, 16, k)).astype(np.float32))
    tmasks = np.zeros((b, 16, 16), np.float32)
    tmasks[:, 4:12, 4:12] = 1
    anchors = jnp.asarray([[0.1, 0.1], [0.12, 0.12], [0.15, 0.15]])
    cfg = SegmentationLossConfig(num_classes=c, seg_candidates_per_image=2)
    _, metrics = seg_scale_loss(
        preds, jnp.asarray(labels), jnp.asarray(mask), protos,
        jnp.asarray(tmasks), anchors, cfg)
    assert float(metrics["seg_dropped_candidates"]) > 0
    # raising the cap absorbs everything (6 boxes x 3 anchors x <=5 lattice
    # cells can produce up to 90 candidates)
    cfg2 = SegmentationLossConfig(num_classes=c, seg_candidates_per_image=128)
    _, metrics2 = seg_scale_loss(
        preds, jnp.asarray(labels), jnp.asarray(mask), protos,
        jnp.asarray(tmasks), anchors, cfg2)
    assert float(metrics2["seg_dropped_candidates"]) == 0
