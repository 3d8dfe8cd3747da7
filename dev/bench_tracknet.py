"""Dev: TrackNet serving throughput (heatmap FPS) on the current chip."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from vision_conglomerate_tpu.models import TrackNet  # noqa: E402
from vision_conglomerate_tpu.nn.blocks import bn_folding  # noqa: E402
from vision_conglomerate_tpu.nn.reparam import deploy_transform  # noqa: E402

CFG = {
    "weight_init": "uniform",
    "architecture": "base",
    "base_arch_config": {
        "encoder_config": {"width_multiple": 1.0},
        "decoder_config": {"width_multiple": 1.0},
    },
}


def main(batch=8, int8=False):
    model = TrackNet(config=CFG, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 352, 640, 9), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x0, train=False)
    dp, ds = deploy_transform(v["params"], v.get("batch_stats", {}), fuse_repvgg=False)
    dv = {"params": dp}
    if ds:
        dv["batch_stats"] = ds

    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 352, 640, 9), jnp.float32)

    from vision_conglomerate_tpu.nn.quantize import int8_serving

    if int8:  # same PTQ protocol as infer/runner.quantize_model_int8
        from vision_conglomerate_tpu.infer.runner import quantize_model_int8
        dv = quantize_model_int8(model, dv, x)

    def fwd(a):
        with bn_folding(), int8_serving(int8):
            return model.apply(dv, a, train=False, inference=True)

    serve = jax.jit(fwd)
    for _ in range(3):
        jax.block_until_ready(serve(x))
    t0 = time.perf_counter()
    for _ in range(10):
        out = serve(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    print(f"tracknet base 640x352 batch={batch}{' int8' if int8 else ''}: "
          f"{dt*1e3:.2f} ms/batch, {batch/dt:.1f} frames/s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8,
         int8="int8" in sys.argv[2:])
