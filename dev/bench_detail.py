"""Dev: component-level timing of the detection serving path on the TPU."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from __graft_entry__ import ANCHORS, DET_CONFIG  # noqa: E402
from vision_conglomerate_tpu.models import DetectionNet  # noqa: E402
from vision_conglomerate_tpu.nn.reparam import reparameterize_params  # noqa: E402
from vision_conglomerate_tpu.ops.postprocess import postprocess_detections  # noqa: E402


def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(batch=32):
    num_classes = 2
    tm = DetectionNet(num_classes=num_classes, config=DET_CONFIG,
                      anchors=ANCHORS, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 640, 640, 3), jnp.float32)
    variables = tm.init(jax.random.PRNGKey(0), x0, train=False)
    dp, ds = reparameterize_params(variables["params"], variables["batch_stats"])
    dm = DetectionNet(num_classes=num_classes, config=DET_CONFIG, anchors=ANCHORS,
                      deploy=True, dtype=jnp.bfloat16)
    dv = {"params": dp}
    if ds:
        dv["batch_stats"] = ds
    tv = variables

    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 640, 640, 3), jnp.float32)

    fwd_deploy = jax.jit(lambda a: dm.apply(dv, a, train=False, inference=True))
    fwd_train_form = jax.jit(lambda a: tm.apply(tv, a, train=False, inference=True))
    post = jax.jit(lambda p: postprocess_detections(
        p, num_classes=num_classes, iou_threshold=0.35, score_threshold=0.3,
        box_allowance=4.0, max_detections=300))
    serve = jax.jit(lambda a: postprocess_detections(
        dm.apply(dv, a, train=False, inference=True),
        num_classes=num_classes, iou_threshold=0.35, score_threshold=0.3,
        box_allowance=4.0, max_detections=300))

    preds = fwd_deploy(x)
    t_fwd = timeit(fwd_deploy, x)
    t_fwd_train = timeit(fwd_train_form, x)
    t_post = timeit(post, preds)
    t_serve = timeit(serve, x)
    n = batch
    print(f"batch={batch}")
    print(f"forward+decode (deploy):     {t_fwd * 1e3:8.2f} ms  {n / t_fwd:8.1f} img/s")
    print(f"forward+decode (train-form): {t_fwd_train * 1e3:8.2f} ms  {n / t_fwd_train:8.1f} img/s")
    print(f"postprocess (NMS):           {t_post * 1e3:8.2f} ms")
    print(f"serve end-to-end:            {t_serve * 1e3:8.2f} ms  {n / t_serve:8.1f} img/s")


if __name__ == "__main__":
    for b in (int(sys.argv[1]),) if len(sys.argv) > 1 else (32, 64, 128):
        main(b)
