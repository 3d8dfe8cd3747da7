"""Dev: segmentation serve throughput + detection train-step device-only
throughput on the current chip."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from __graft_entry__ import ANCHORS, DET_CONFIG  # noqa: E402


def bench_seg_serve(batch=32):
    from vision_conglomerate_tpu.models import SegmentationNet
    from vision_conglomerate_tpu.nn.blocks import bn_folding
    from vision_conglomerate_tpu.nn.reparam import deploy_transform
    from vision_conglomerate_tpu.ops.postprocess import (
        assemble_instance_masks, postprocess_detections)

    cfg = dict(DET_CONFIG)
    cfg["num_masks"] = 32
    cfg["protos_config"] = {"c_h": 256}
    model = SegmentationNet(num_classes=2, config=cfg, anchors=ANCHORS, dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)), train=False)
    dp, ds = deploy_transform(v["params"], v["batch_stats"], fuse_repvgg=True)
    dm = SegmentationNet(num_classes=2, config=cfg, anchors=ANCHORS,
                         deploy=True, dtype=jnp.bfloat16)
    dv = {"params": dp}
    if ds:
        dv["batch_stats"] = ds

    def serve_fn(a):
        with bn_folding():
            preds, protos = dm.apply(dv, a, train=False, inference=True)
        post = postprocess_detections(
            preds, num_classes=2, num_masks=32, iou_threshold=0.35,
            score_threshold=0.3, box_allowance=4.0, max_detections=100)
        masks = assemble_instance_masks(protos, post.mask_coefs)
        return post, masks

    serve = jax.jit(serve_fn)
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 640, 640, 3), jnp.float32)
    for _ in range(3):
        jax.block_until_ready(serve(x))
    t0 = time.perf_counter()
    for _ in range(10):
        out = serve(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    print(f"seg serve (incl. masks) batch={batch}: {dt*1e3:.2f} ms, {batch/dt:.1f} img/s")


def bench_det_train_step(batch=16):
    from vision_conglomerate_tpu.losses import DetectionLossConfig
    from vision_conglomerate_tpu.models import DetectionNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainDetectionPipeline, make_optimizer

    model = DetectionNet(num_classes=2, config=DET_CONFIG, anchors=ANCHORS,
                         dtype=jnp.bfloat16)
    tx, _ = make_optimizer({"name": "Adam", "lr": 1e-3})
    pipe = TrainDetectionPipeline(
        model, DetectionLossConfig(num_classes=2), tx,
        mesh=make_mesh(1), sample_input_shape=(640, 640, 3))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray((rng.uniform(size=(batch, 640, 640, 3)) * 255).astype(np.uint8))
    labels = np.zeros((batch, 64, 5), np.float32)
    labels[:, 0] = [0, 0.5, 0.5, 0.2, 0.2]
    labels[:, 1] = [1, 0.3, 0.3, 0.1, 0.1]
    mask = np.zeros((batch, 64), bool)
    mask[:, :2] = True
    labels = jnp.asarray(labels)
    mask = jnp.asarray(mask)
    lr = jnp.float32(1e-3)

    state = pipe.state
    for _ in range(3):
        state, m = pipe._train_step(state, lr, imgs, labels, mask)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = pipe._train_step(state, lr, imgs, labels, mask)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / 10
    print(f"det train step (device-only) batch={batch}: {dt*1e3:.2f} ms, {batch/dt:.1f} img/s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    batches = [int(b) for b in sys.argv[2:]] or [None]
    for b in batches:
        if which in ("seg", "both"):
            bench_seg_serve(**({"batch": b} if b else {}))
        if which in ("train", "both"):
            bench_det_train_step(**({"batch": b} if b else {}))
