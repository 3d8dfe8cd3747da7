"""torch_port CLI roundtrip: reference .pth.tar manifest -> our .ckpt.tar ->
inference driver consumes it."""
import os
import sys

import numpy as np
import pytest

from tests.test_loss_parity import ref_modules  # noqa: F401
from tests.test_torch_port_parity import ANCHORS, CONFIG


def test_torch_port_cli_roundtrip(ref_modules, tmp_path, monkeypatch):  # noqa: F811
    import torch
    from modules.detection import DetectionNet as RefDetectionNet

    torch.manual_seed(0)
    ref_model = RefDetectionNet(3, num_classes=2, config=CONFIG, anchors=ANCHORS)
    manifest = {
        "LAST_EPOCH": 7,
        "NETWORK_PARAMS": ref_model.state_dict(),
        "NUM_CLASSES": 2,
    }
    src = str(tmp_path / "ref.pth.tar")
    dst = str(tmp_path / "ported.ckpt.tar")
    torch.save(manifest, src)

    monkeypatch.setattr(sys, "argv", ["torch_port", src, dst])
    from vision_conglomerate_tpu.tools.torch_port import main
    main()
    assert os.path.exists(dst)

    # the inference loader consumes the ported checkpoint (parity mode:
    # reference checkpoints imply branch-activated RepVGG -> no full fusion)
    from vision_conglomerate_tpu.infer.runner import load_detection_model
    import jax.numpy as jnp

    from vision_conglomerate_tpu.nn.blocks import bn_folding

    model, variables, num_classes = load_detection_model(
        dst, CONFIG, task="detection", use_reparam=True, dtype=jnp.float32)
    assert num_classes == 2
    with bn_folding():  # folded params are applied in BN-folding mode
        out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False,
                          inference=True)
    assert np.isfinite(np.asarray(out)).all()

    # and the folded deploy form equals the torch reference forward
    import torch as _torch
    rng = np.random.default_rng(5)
    x = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    ref_model.eval()
    with _torch.no_grad():
        ref_out = ref_model(_torch.from_numpy(x.transpose(0, 3, 1, 2)), inference=True)
    with bn_folding():
        ours = model.apply(variables, jnp.asarray(x), train=False, inference=True)
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), atol=5e-3, rtol=1e-3)
