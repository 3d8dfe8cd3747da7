"""Multi-chip data-parallel serving: 8-device mesh output == single device."""
import numpy as np

import jax
import jax.numpy as jnp

from vision_conglomerate_tpu.models import DetectionNet
from vision_conglomerate_tpu.ops.postprocess import postprocess_detections
from vision_conglomerate_tpu.parallel import make_mesh
from vision_conglomerate_tpu.parallel.serving import make_dp_serve

from tests.test_e2e import ANCHORS, TINY_MODEL_CONFIG


def test_dp_serve_matches_single_device():
    model = DetectionNet(num_classes=2, config=TINY_MODEL_CONFIG, anchors=ANCHORS)
    x0 = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    def serve_fn(batch):
        preds = model.apply(variables, batch, train=False, inference=True)
        return postprocess_detections(
            preds, num_classes=2, iou_threshold=0.5, score_threshold=0.0,
            max_detections=8, pre_nms_topk=64)

    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 64, 64, 3))
    single = serve_fn(x)
    dp = make_dp_serve(serve_fn, make_mesh(8))(x)
    np.testing.assert_allclose(
        np.asarray(single.boxes_xyxy), np.asarray(dp.boxes_xyxy),
        atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(single.valid), np.asarray(dp.valid))


def test_dp_serve_rejects_indivisible_batch():
    import pytest

    mesh = make_mesh(8)
    serve = make_dp_serve(lambda b: b * 2, mesh)
    with pytest.raises(ValueError):
        serve(jnp.ones((6, 4)))
    out = serve(jnp.ones((16, 4)))
    np.testing.assert_allclose(np.asarray(out), 2.0)
