"""Dev: end-to-end CLI-style detection training epoch throughput, prefetch
A/B (VERDICT r2 item #5: the trainers now device_put batches 2 steps ahead;
this measures the delta vs the old synchronous in-step transfer on the real
tunneled chip), plus a grounded train-step MFU from XLA cost analysis
(VERDICT r2 item #7 tail: the PERF.md device-only train img/s number had no
FLOP grounding).

Usage (on the axon chip):
    python dev/bench_prefetch.py [batch] [epochs_per_arm]

Uses data/detection_kp + configs/detection/config_kp.yaml (the only
checked-in detection dataset); the A/B compares identical trainer state —
prefetch off is a passthrough `_prefetch` monkeypatch, exactly the pre-fix
code path (iterate host batches, `jnp.asarray` inside step()).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(batch=16, epochs_per_arm=2):
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import train_det
    from vision_conglomerate_tpu.losses import DetectionLossConfig
    from vision_conglomerate_tpu.models import DetectionNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainDetectionPipeline, make_optimizer
    from vision_conglomerate_tpu.utils import load_yaml

    config = load_yaml("configs/detection/config_kp.yaml")
    anchors = load_yaml("configs/detection/anchors_kp.yaml")["anchors"]
    ds = train_det.make_dataset(config, "train")
    dl = train_det.make_dataloader(ds, batch, config)
    model = DetectionNet(
        num_classes=2, config=config["model_config"], anchors=anchors,
        num_keypoints=ds.num_keypoints or None, dtype=jnp.bfloat16)
    tx, _ = make_optimizer(dict(config["train_config"]["optimizer_config"]))
    img_wh = tuple(config["train_config"]["img_config"]["img_wh"])
    pipe = TrainDetectionPipeline(
        model,
        DetectionLossConfig(num_classes=2, num_keypoints=ds.num_keypoints or 0),
        tx, mesh=make_mesh(1), sample_input_shape=(img_wh[1], img_wh[0], 3))

    # --- grounded train-step MFU: FLOPs from XLA cost analysis ------------
    first = next(iter(dl))
    dev_batch = tuple(jnp.asarray(b) for b in first)
    lr = jnp.float32(1e-3)
    compiled = pipe._train_step.lower(pipe.state, lr, *dev_batch).compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        step_flops = float(ca.get("flops", 0.0))
    except Exception:
        step_flops = 0.0

    # device-only step time (no input pipeline): how fast the step itself is
    state = pipe.state
    for _ in range(3):
        state, m = pipe._train_step(state, lr, *dev_batch)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = pipe._train_step(state, lr, *dev_batch)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / 10
    dev_imgs = batch / dt
    # _train_step donates its state arg, so the manual timing loop above
    # deleted pipe.state's buffers — adopt the stepped state before the A/B
    pipe.state = state
    peak_tflops = float(os.environ.get("VCT_PEAK_TFLOPS", "197"))  # v5e bf16
    train_mfu = (step_flops / dt) / (peak_tflops * 1e12)
    print(f"train step device-only b{batch}: {dt * 1e3:.1f} ms, "
          f"{dev_imgs:.1f} img/s, {step_flops / batch / 1e9:.1f} GFLOP/img, "
          f"MFU {train_mfu * 100:.1f}% (vs {peak_tflops} TFLOP/s bf16 peak)")

    # --- prefetch A/B: full epochs through the real DataLoader ------------
    def run_epochs(tag):
        rates = []
        for e in range(epochs_per_arm):
            m = pipe.step(dl, "train")
            rates.append(m["images_per_sec"])
            print(f"  {tag} epoch {e}: {m['images_per_sec']:.2f} img/s")
        return max(rates)

    pipe.step(dl, "train")  # warm: compile + thread-pool spin-up
    on = run_epochs("prefetch-on ")
    orig = pipe._prefetch
    pipe._prefetch = lambda dataloader, size=2: iter(dataloader)
    off = run_epochs("prefetch-off")
    pipe._prefetch = orig
    print(f"RESULT prefetch_on={on:.2f} img/s prefetch_off={off:.2f} img/s "
          f"speedup={on / off:.3f}x (b{batch}, {len(dl)} steps/epoch, "
          f"device-only {dev_imgs:.1f} img/s)")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
