"""Attribute the detection TRAIN step cost by stage ablation (device-resident).

The xprof trace of the train step is a long tail of sub-ms fusions (no single
hot op), so attribution comes from differencing jitted ablation arms instead:

  fwd        forward only (train=True, mutable batch_stats)
  loss       forward + assignment + detection loss (value only)
  grad       value_and_grad of the same (adds the backward pass)
  full       the production train step (adds pmean + optimizer + state update)

loss-fwd ~= assignment+loss forward cost, grad-loss ~= backward cost,
full-grad ~= optimizer/bookkeeping. Also sweeps batch sizes on the full step
to locate the train-throughput knee (serve's is 128; train is memory-heavier).

Usage: python dev/bench_train_stages.py [iters] [batches...]
       (defaults: 10 iters, batches 8 16 32)
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

if os.environ.get("VCT_CPU"):  # CPU smoke (the axon pin ignores env vars)
    jax.config.update("jax_platforms", "cpu")
SIZE = int(os.environ.get("VCT_SIZE", "640"))

sys.path.insert(0, ".")
from __graft_entry__ import ANCHORS, DET_CONFIG  # noqa: E402
from vision_conglomerate_tpu.losses import (  # noqa: E402
    DetectionLossConfig, detection_loss)
from vision_conglomerate_tpu.models import DetectionNet  # noqa: E402
from vision_conglomerate_tpu.parallel import make_mesh  # noqa: E402
from vision_conglomerate_tpu.train import (  # noqa: E402
    TrainDetectionPipeline, make_optimizer)

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
BATCHES = [int(a) for a in sys.argv[2:]] or [8, 16, 32]


def _batch(rng, n):
    imgs = jnp.asarray((rng.uniform(size=(n, SIZE, SIZE, 3)) * 255).astype(np.uint8))
    labels = np.zeros((n, 16, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.3, 0.3]
    labels[:, 1] = [0, 0.25, 0.3, 0.04, 0.04]
    mask = np.zeros((n, 16), bool)
    mask[:, :2] = True
    return imgs, jnp.asarray(labels), jnp.asarray(mask)


def _time(fn, *args):
    out = fn(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1000.0


def main():
    cfg = dict(DET_CONFIG)
    cfg["dtype"] = "bfloat16"
    if os.environ.get("VCT_REMAT"):  # A/B arm: stage-granular rematerialization
        cfg["remat"] = True
        print("[remat ON]")
    model = DetectionNet(num_classes=2, config=cfg, anchors=ANCHORS,
                         dtype=jnp.bfloat16)
    loss_cfg = DetectionLossConfig(num_classes=2)
    tx, _ = make_optimizer({"name": "Adam", "lr": 1e-3})
    pipe = TrainDetectionPipeline(
        model, loss_cfg, tx, mesh=make_mesh(1), sample_input_shape=(SIZE, SIZE, 3))
    params, bstats = pipe.state.params, pipe.state.batch_stats
    rng = np.random.default_rng(0)

    def fwd(p, bs, imgs):
        x = imgs.astype(jnp.float32) / 255.0
        out, mut = model.apply({"params": p, "batch_stats": bs}, x,
                               train=True, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    def loss_only(p, bs, imgs, labels, mask):
        out, new_bs = fwd(p, bs, imgs)
        loss, metrics = detection_loss(
            out, labels, mask, (p["sm_anchors"], p["md_anchors"], p["lg_anchors"]),
            loss_cfg)
        return loss, (metrics, new_bs)

    grad_fn = jax.jit(jax.value_and_grad(loss_only, has_aux=True))
    fwd_fn = jax.jit(fwd)
    loss_fn = jax.jit(loss_only)

    b0 = BATCHES[0]
    imgs, labels, mask = _batch(rng, b0)
    lr = jnp.float32(1e-3)
    if os.environ.get("VCT_FULL_ONLY"):  # skip the 3 staged-arm compiles
        t_fwd = t_loss = t_grad = float("nan")
    else:
        t_fwd = _time(fwd_fn, params, bstats, imgs)
        t_loss = _time(loss_fn, params, bstats, imgs, labels, mask)
        t_grad = _time(grad_fn, params, bstats, imgs, labels, mask)

    def _time_full(state, imgs, labels, mask):
        # _train_step donates the state: re-chain it through every call.
        # TWO warmup calls: the first traces step as a weak-typed python int,
        # the second compiles the steady-state int32-step variant — timing
        # after one warmup would put that second (multi-minute tunnel)
        # compile inside the timed loop.
        for _ in range(2):
            state, _ = pipe._train_step(state, lr, imgs, labels, mask)
        jax.block_until_ready(state.params)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, _ = pipe._train_step(state, lr, imgs, labels, mask)
        jax.block_until_ready(state.params)
        return (time.perf_counter() - t0) / ITERS * 1000.0, state

    t_full, cur_state = _time_full(pipe.state, imgs, labels, mask)
    print(f"batch {b0}: fwd {t_fwd:.1f} ms | +assign/loss {t_loss:.1f} "
          f"(+{t_loss - t_fwd:.1f}) | +backward {t_grad:.1f} "
          f"(+{t_grad - t_loss:.1f}) | full step {t_full:.1f} "
          f"(+{t_full - t_grad:.1f})")

    for n in BATCHES:
        imgs, labels, mask = _batch(rng, n)
        lowered = pipe._train_step.lower(cur_state, lr, imgs, labels, mask)
        compiled = lowered.compile()
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            gflops_img = float(ca.get("flops", 0.0)) / n / 1e9
        except Exception:
            gflops_img = 0.0
        t, cur_state = _time_full(cur_state, imgs, labels, mask)
        ips = n / (t / 1000.0)
        tf = ips * gflops_img / 1e3
        print(f"full step batch {n}: {t:.1f} ms = {ips:.1f} img/s, "
              f"{gflops_img:.1f} GFLOP/img -> {tf:.1f} TFLOP/s "
              f"(MFU {tf / 197.0:.1%} vs bf16 peak)")


if __name__ == "__main__":
    main()
