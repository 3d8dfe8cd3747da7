"""Shared dev-bench helpers: build the deploy-form flagship DetectionNet and
time a jitted serve fn — the block every serve bench was copy-pasting."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def build_deploy_model(num_classes=2, dtype=jnp.bfloat16, fuse_repvgg=True):
    """(model, deploy_vars): random-init flagship DetectionNet in deploy form
    (RepVGG branches fused, conv-BN folded). Apply under bn_folding()."""
    from __graft_entry__ import ANCHORS, DET_CONFIG
    from vision_conglomerate_tpu.models import DetectionNet
    from vision_conglomerate_tpu.nn.reparam import deploy_transform

    train_model = DetectionNet(
        num_classes=num_classes, config=DET_CONFIG, anchors=ANCHORS, dtype=dtype)
    x0 = jnp.zeros((1, 640, 640, 3), jnp.float32)
    variables = train_model.init(jax.random.PRNGKey(0), x0, train=False)
    dparams, dstats = deploy_transform(
        variables["params"], variables["batch_stats"], fuse_repvgg=fuse_repvgg)
    model = DetectionNet(
        num_classes=num_classes, config=DET_CONFIG, anchors=ANCHORS,
        deploy=fuse_repvgg, dtype=dtype)
    deploy_vars = {"params": dparams}
    if dstats:
        deploy_vars["batch_stats"] = dstats
    return model, deploy_vars


def timed(fn, x, iters=10, warmup=2):
    """(imgs_per_sec, ms_per_batch) for a jitted fn over batch input x."""
    for _ in range(warmup):
        jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return x.shape[0] / dt, dt * 1000
