"""Dev: TrackNet serving throughput + FLOP/MFU grounding on the current chip.

Same cost-analysis protocol as bench.py (VERDICT r3 item #7): XLA cost
analysis of the compiled program gives GFLOP/frame; achieved TFLOP/s and MFU
are derived from measured frames/s so the TrackNet numbers are directly
comparable to the detection bench rows.

Usage: python dev/bench_tracknet.py [batch] [int8] [advanced]
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from vision_conglomerate_tpu.models import TrackNet  # noqa: E402
from vision_conglomerate_tpu.nn.blocks import bn_folding  # noqa: E402
from vision_conglomerate_tpu.nn.reparam import deploy_transform  # noqa: E402

BASE_CFG = {
    "weight_init": "uniform",
    "architecture": "base",
    "base_arch_config": {
        "encoder_config": {"width_multiple": 1.0},
        "decoder_config": {"width_multiple": 1.0},
    },
}

ADV_CFG = {
    "weight_init": "xavier",
    "architecture": "advanced",
    "advanced_arch_config": {
        "encoder_modules": ["CSPNet", "RepBiPAN"],
        "decoder_modules": ["DeconvRepBiPAN", "DeconvCSPNet"],
        "encoder_config": {
            "cspnet_config": {"width_multiple": 0.5, "depth_multiple": 0.3},
            "repbipan_config": {"width_multiple": 0.5, "depth_multiple": 0.3},
        },
        "decoder_config": {
            "deconvrepbipan_config": {"width_multiple": 0.5, "depth_multiple": 0.3},
            "deconvcspnet_config": {"width_multiple": 0.5, "depth_multiple": 0.3},
        },
    },
}

PEAK_TFLOPS = {"TPU v5 lite": 197.0, "TPU v5e": 197.0, "TPU v4": 275.0,
               "TPU v6 lite": 918.0}
PEAK_INT8_TOPS = {"TPU v5 lite": 394.0, "TPU v5e": 394.0, "TPU v4": 275.0,
                  "TPU v6 lite": 1836.0}


def _cost_analysis_flops(compiled) -> float:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def main(batch=8, int8=False, advanced=False):
    cfg = ADV_CFG if advanced else BASE_CFG
    model = TrackNet(config=cfg, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 352, 640, 9), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x0, train=False)
    dp, ds = deploy_transform(v["params"], v.get("batch_stats", {}),
                              fuse_repvgg=False)
    dv = {"params": dp}
    if ds:
        dv["batch_stats"] = ds

    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 352, 640, 9), jnp.float32)

    from vision_conglomerate_tpu.nn.quantize import int8_serving

    if int8:  # same PTQ protocol as infer/runner.quantize_model_int8;
        # calibrate on a small slice — activation capture holds every conv
        # output simultaneously, and at batch 64 on the 640x352 decoder
        # feature maps that exhausts HBM (scales are batch-size independent)
        from vision_conglomerate_tpu.infer.runner import quantize_model_int8
        dv = quantize_model_int8(model, dv, x[:8])

    def fwd(a):
        with bn_folding(), int8_serving(int8):
            return model.apply(dv, a, train=False, inference=True)

    serve = jax.jit(fwd)
    compiled = serve.lower(x).compile()
    total_flops = _cost_analysis_flops(compiled)
    gflops_per_frame = total_flops / batch / 1e9 if total_flops else 0.0

    for _ in range(3):
        jax.block_until_ready(serve(x))
    t0 = time.perf_counter()
    for _ in range(10):
        out = serve(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    fps = batch / dt
    achieved_tflops = fps * gflops_per_frame / 1e3
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "")
    peak = PEAK_TFLOPS.get(kind)
    mode_peak = (PEAK_INT8_TOPS if int8 else PEAK_TFLOPS).get(kind)
    arch = "advanced" if advanced else "base"
    print(f"tracknet {arch} 640x352 batch={batch}{' int8' if int8 else ''}: "
          f"{dt*1e3:.2f} ms/batch, {fps:.1f} frames/s", file=sys.stderr)
    print(json.dumps({
        "metric": f"tracknet_{arch}_frames_per_sec" + ("_int8" if int8 else ""),
        "batch": batch,
        "frames_per_sec": round(fps, 1),
        "ms_per_batch": round(dt * 1e3, 2),
        "gflops_per_frame": round(gflops_per_frame, 2),
        "achieved_tflops": round(achieved_tflops, 2),
        "mfu": round(achieved_tflops / peak, 4) if peak else None,
        "mfu_vs_mode_peak": (round(achieved_tflops / mode_peak, 4)
                             if mode_peak else None),
        "device_kind": kind,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8,
         int8="int8" in sys.argv[2:],
         advanced="advanced" in sys.argv[2:])
