"""THE forward-parity test: convert random reference (torch) weights with
tools/torch_port and compare full-model forward outputs numerically.

This validates every layer's semantics end to end — channel wiring, padding,
pooling, upsampling, decode math — against the reference implementation
executed on torch-CPU (import stubs installed by tests/test_loss_parity.py).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_loss_parity import ref_modules  # noqa: F401

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
    "sm": [[0.05, 0.06], [0.1, 0.1], [0.15, 0.12]],
    "md": [[0.2, 0.2], [0.3, 0.25], [0.25, 0.35]],
    "lg": [[0.4, 0.5], [0.6, 0.5], [0.7, 0.8]],
}


@pytest.mark.parametrize("inference", [False, True])
def test_detection_forward_parity_with_reference_weights(ref_modules, inference):  # noqa: F811
    import torch
    from modules.detection import DetectionNet as RefDetectionNet

    from vision_conglomerate_tpu.models import DetectionNet
    from vision_conglomerate_tpu.tools.torch_port import convert_torch_state_dict

    torch.manual_seed(0)
    ref_model = RefDetectionNet(3, num_classes=2, config=CONFIG, anchors=ANCHORS)
    ref_model.eval()

    variables = convert_torch_state_dict(ref_model.state_dict())
    model = DetectionNet(num_classes=2, config=CONFIG, anchors=ANCHORS)

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    x_torch = torch.from_numpy(x.transpose(0, 3, 1, 2))

    with torch.no_grad():
        ref_out = ref_model(x_torch, inference=inference)
    our_out = model.apply(variables, jnp.asarray(x), train=False, inference=inference)

    if inference:
        np.testing.assert_allclose(
            np.asarray(our_out), ref_out.numpy(), atol=5e-3, rtol=1e-4)
    else:
        for ours, ref in zip(our_out, ref_out):
            np.testing.assert_allclose(
                np.asarray(ours), ref.numpy(), atol=1e-4, rtol=1e-4)


def test_segmentation_forward_parity(ref_modules):  # noqa: F811
    import torch
    from modules.segmentation import SegmentationNet as RefSegmentationNet

    from vision_conglomerate_tpu.models import SegmentationNet
    from vision_conglomerate_tpu.tools.torch_port import convert_torch_state_dict

    cfg = dict(CONFIG)
    cfg["num_masks"] = 8
    cfg["protos_config"] = {"c_h": 32}
    torch.manual_seed(1)
    ref_model = RefSegmentationNet(3, num_classes=2, config=cfg, anchors=ANCHORS)
    ref_model.eval()

    variables = convert_torch_state_dict(ref_model.state_dict())
    model = SegmentationNet(num_classes=2, config=cfg, anchors=ANCHORS)

    rng = np.random.default_rng(1)
    x = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_preds, ref_protos = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    our_preds, our_protos = model.apply(variables, jnp.asarray(x), train=False)

    for ours, ref in zip(our_preds, ref_preds):
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4, rtol=1e-4)
    # protos: ours NHWC, reference NCHW
    np.testing.assert_allclose(
        np.asarray(our_protos).transpose(0, 3, 1, 2), ref_protos.numpy(),
        atol=1e-4, rtol=1e-4)


def test_tracknet_advanced_forward_parity(ref_modules):  # noqa: F811
    import torch
    from modules.tracknet import TrackNet as RefTrackNet

    from vision_conglomerate_tpu.models import TrackNet
    from vision_conglomerate_tpu.tools.torch_port import convert_torch_state_dict

    cfg = {
        "weight_init": "xavier",
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
    torch.manual_seed(3)
    ref_model = RefTrackNet(9, config=cfg)
    ref_model.eval()

    variables = convert_torch_state_dict(ref_model.state_dict())
    model = TrackNet(config=cfg)

    rng = np.random.default_rng(3)
    x = rng.uniform(size=(1, 32, 64, 9)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    our_out = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(our_out), ref_out.numpy(), atol=1e-4, rtol=1e-4)


def test_tracknet_base_forward_parity(ref_modules):  # noqa: F811
    import torch
    from modules.tracknet import TrackNet as RefTrackNet

    from vision_conglomerate_tpu.models import TrackNet
    from vision_conglomerate_tpu.tools.torch_port import convert_torch_state_dict

    # NOTE width_multiple must be 1.0: the reference's base decoder hardcodes
    # its final conv input as 64 channels (tracknet.py:65), so any other
    # width crashes the reference itself (our flax version infers channels
    # and works at any width).
    cfg = {
        "weight_init": "uniform",
        "architecture": "base",
        "base_arch_config": {
            "encoder_config": {"width_multiple": 1.0},
            "decoder_config": {"width_multiple": 1.0},
        },
    }
    torch.manual_seed(2)
    ref_model = RefTrackNet(9, config=cfg)
    ref_model.eval()

    variables = convert_torch_state_dict(ref_model.state_dict())
    model = TrackNet(config=cfg)

    rng = np.random.default_rng(2)
    x = rng.uniform(size=(1, 32, 64, 9)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    our_out = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(our_out), ref_out.numpy(), atol=1e-4, rtol=1e-4)
