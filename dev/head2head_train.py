"""Head-to-head full training run: this framework vs the EXECUTING torch
reference, identical everything (VERDICT r4 next-round item #2).

The strongest available accuracy-parity statement short of the
credential-gated real dataset: train the actual reference code path
(/root/reference/pipeline/detection_trainer.py:143-204 driven the way
train_det.py:61-174 does) AND this framework's production pipeline on the
SAME synthetic shapes dataset from the SAME ported initial weights with the
same anchors, loss config, optimizer and batch order (shuffle off, sorted
files both sides, no augmentation on either), then:

- record both per-epoch train/eval aggregate-loss trajectories;
- score BOTH final checkpoints with the SAME eval harness
  (tools/eval_harness.evaluate_checkpoint_map): the torch-trained weights
  are ported through tools/torch_port into a framework manifest, so the
  serving/eval stack is shared and the only difference being measured is
  TRAINING (forward/opt parity is covered by tests/test_torch_port_parity
  and tests/test_training_parity; this scales those 3-step checks to a
  full run).

CPU-scale by necessity (this container: 1 CPU core, and the torch
reference cannot target the TPU): default 128px images, production model
widths (width 0.5 / depth 0.3, reference-parity RepVGG branch SiLU
defaults in both).

Usage:
  python dev/head2head_train.py <workspace> [epochs=30] [img=128]
      [n_train=48] [n_val=16] [batch=8]
Writes <workspace>/head2head.json and prints it.
"""
import json
import os
import sys
import time
import types

sys.path.insert(0, "/root/repo")

import dev.cpu  # noqa: F401  (force the CPU backend before jax init)

REF = "/root/reference"

# production widths; defaults give reference-parity RepVGG branch SiLU in
# BOTH frameworks (CLAUDE.md quirk note)
CONFIG = {
    "train_anchors": True,
    "backbone": "CSPBackBone",
    "neck": "RepBiPAN",
    "head": "EffiDecHead",
    "cspbackbone_config": {"width_multiple": 0.5, "depth_multiple": 0.3},
    "repbipan_config": {"width_multiple": 0.5, "depth_multiple": 0.3},
    "effidechead_config": {"width_multiple": 0.5},
}

# anchors for the shapes set (graft-entry values, normalized => size-free);
# auto-anchor evolution is intentionally OFF so both sides see identical
# constants
ANCHORS = {
    "sm": [[0.034, 0.118], [0.049, 0.098], [0.055, 0.1]],
    "md": [[0.059, 0.2], [0.066, 0.338], [0.083, 0.347]],
    "lg": [[0.094, 0.347], [0.107, 0.336], [0.117, 0.295]],
}

# the shipped loss config (configs/detection/config.yaml), applied verbatim
# to both loss implementations
LOSS_KW = dict(box_w=0.1, conf_w=1.0, class_w=0.3, keypoints_w=5.0,
               anchor_t=4.0, edge_t=0.5, label_smoothing=0.001,
               batch_scale_loss=False, scale_w=[4.0, 2.0, 1.0])
LR = 1e-3  # shipped optimizer_config: Adam(1e-3); no lr schedule (the
           # shipped CosineAnnealingWarmRestarts T_0=200 is ~constant at
           # this scale anyway)


def install_ref_stubs():
    """Reference import stubs (same as tests/test_loss_parity.ref_modules):
    supervision/torchvision are absent in this image and unused by the
    training path."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "supervision" not in sys.modules:
        sys.modules["supervision"] = types.SimpleNamespace(Detections=object)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv_resnet = types.ModuleType("torchvision.models.resnet")

        class _Stub:
            pass

        tv_resnet.ResNet = _Stub
        tv_resnet.BasicBlock = _Stub
        tv_resnet.Bottleneck = _Stub
        tv_models.resnet = tv_resnet
        tv_tf = types.ModuleType("torchvision.transforms")
        tv_tf_f = types.ModuleType("torchvision.transforms.functional")
        tv_ops = types.ModuleType("torchvision.ops")
        tv.models = tv_models
        tv.transforms = tv_tf
        tv.ops = tv_ops
        tv_tf.functional = tv_tf_f
        for name, mod in [
            ("torchvision", tv), ("torchvision.models", tv_models),
            ("torchvision.models.resnet", tv_resnet),
            ("torchvision.transforms", tv_tf),
            ("torchvision.transforms.functional", tv_tf_f),
            ("torchvision.ops", tv_ops),
        ]:
            sys.modules[name] = mod


def train_reference(ws, epochs, img, batch, init_path, final_path, cfg_yaml):
    """Drive the reference's own TrainDetectionPipeline on torch-CPU."""
    import torch

    install_ref_stubs()
    from modules.detection import DetectionNet as RefDetectionNet
    from modules.detection_loss import DetectionLoss as RefDetectionLoss
    from dataset.detection_dataset import DetectionDataset as RefDataset
    from pipeline.detection_trainer import TrainDetectionPipeline as RefPipeline
    from torch.utils.data import DataLoader as TorchLoader

    torch.manual_seed(0)
    model = RefDetectionNet(3, num_classes=2, config=CONFIG, anchors=ANCHORS)
    torch.save(model.state_dict(), init_path)  # shared starting point

    loss_fn = RefDetectionLoss(model, **{k: v for k, v in LOSS_KW.items()})
    opt = torch.optim.Adam(model.parameters(), lr=LR)

    train_ds = RefDataset(os.path.join(ws, "data/train"), img_ext="png",
                          img_wh=(img, img))
    val_ds = RefDataset(os.path.join(ws, "data/valid"), img_ext="png",
                        img_wh=(img, img))
    train_dl = TorchLoader(train_ds, batch_size=batch, shuffle=False,
                           num_workers=0, collate_fn=train_ds.collate_fn)
    val_dl = TorchLoader(val_ds, batch_size=batch, shuffle=False,
                         num_workers=0, collate_fn=val_ds.collate_fn)

    ref_cwd = os.path.join(ws, "ref")
    os.makedirs(ref_cwd, exist_ok=True)
    cwd = os.getcwd()
    os.chdir(ref_cwd)  # the reference pipeline writes artifact dirs in cwd
    try:
        pipe = RefPipeline(model, loss_fn, opt, config_path=cfg_yaml)
        tr_losses, ev_losses = [], []
        t0 = time.perf_counter()
        for e in range(epochs):
            m = pipe.train(train_dl)
            ev = pipe.evaluate(val_dl)
            tr_losses.append(float(m["aggregate_loss"]))
            ev_losses.append(float(ev["aggregate_loss"]))
            print(f"[ref] epoch {e + 1}/{epochs} train {tr_losses[-1]:.4f} "
                  f"eval {ev_losses[-1]:.4f}", flush=True)
        wall = time.perf_counter() - t0
    finally:
        os.chdir(cwd)
    torch.save(model.state_dict(), final_path)
    return tr_losses, ev_losses, wall


def train_ours(ws, epochs, img, batch, init_state_dict_path, final_ckpt):
    """Drive THIS framework's production pipeline from the ported init."""
    import torch

    from vision_conglomerate_tpu.data import DataLoader, DetectionDataset
    from vision_conglomerate_tpu.losses import DetectionLossConfig
    from vision_conglomerate_tpu.models import DetectionNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.tools.torch_port import convert_torch_state_dict
    from vision_conglomerate_tpu.train import TrainDetectionPipeline, make_optimizer
    from vision_conglomerate_tpu.train.checkpoint import save_checkpoint

    variables = convert_torch_state_dict(
        torch.load(init_state_dict_path, map_location="cpu"))
    init_ckpt = os.path.join(ws, "ours_init.ckpt.tar")
    save_checkpoint(init_ckpt, {
        "LAST_EPOCH": 0, "NETWORK_PARAMS": variables, "NUM_CLASSES": 2})

    import jax.numpy as jnp

    lw = dict(LOSS_KW)
    lw["scale_w"] = tuple(lw["scale_w"])
    model = DetectionNet(num_classes=2, config=CONFIG, anchors=ANCHORS,
                         dtype=jnp.float32)  # torch-CPU is f32: compare like
    tx, _ = make_optimizer({"name": "Adam", "lr": LR})
    pipe = TrainDetectionPipeline(
        model, DetectionLossConfig(num_classes=2, **lw), tx,
        mesh=make_mesh(1), checkpoint_path=init_ckpt,
        sample_input_shape=(img, img, 3))

    train_ds = DetectionDataset(os.path.join(ws, "data/train"), img_ext="png",
                                img_wh=(img, img), max_labels=16)
    val_ds = DetectionDataset(os.path.join(ws, "data/valid"), img_ext="png",
                              img_wh=(img, img), max_labels=16)
    train_dl = DataLoader(train_ds, batch_size=batch, shuffle=False,
                          num_workers=2, pad_last="wrap")
    val_dl = DataLoader(val_ds, batch_size=batch, shuffle=False,
                        num_workers=2, pad_last="wrap")

    tr_losses, ev_losses = [], []
    t0 = time.perf_counter()
    for e in range(epochs):
        m = pipe.train(train_dl)
        ev = pipe.evaluate(val_dl)
        tr_losses.append(float(m["aggregate_loss"]))
        ev_losses.append(float(ev["aggregate_loss"]))
        print(f"[ours] epoch {e + 1}/{epochs} train {tr_losses[-1]:.4f} "
              f"eval {ev_losses[-1]:.4f}", flush=True)
    wall = time.perf_counter() - t0

    pipe.best_model_dir = os.path.dirname(final_ckpt)
    pipe.save_best_model()
    return tr_losses, ev_losses, wall


def score_map(ckpt, ws, img, label):
    import jax.numpy as jnp

    from vision_conglomerate_tpu.tools.eval_harness import evaluate_checkpoint_map

    config = {"model_config": CONFIG,
              "train_config": {"img_config": {"img_wh": [img, img],
                                              "img_ext": "png"}}}
    r = evaluate_checkpoint_map(
        ckpt, config, os.path.join(ws, "data/valid"), batch_size=8,
        dtype=jnp.float32, max_labels=16)
    print(f"[{label}] map50 = {r['map']:.4f} "
          f"ap/class = {[round(float(v), 4) for v in r['ap_per_class']]}",
          flush=True)
    return r


def main():
    ws = os.path.abspath(sys.argv[1])
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    img = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    n_train = int(sys.argv[4]) if len(sys.argv) > 4 else 48
    n_val = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    batch = int(sys.argv[6]) if len(sys.argv) > 6 else 8
    os.makedirs(ws, exist_ok=True)

    import numpy as np

    from dev.make_shapes_dataset import make_split

    make_split(os.path.join(ws, "data/train"), n_train, img,
               np.random.default_rng(0))
    make_split(os.path.join(ws, "data/valid"), n_val, img,
               np.random.default_rng(1))

    import yaml
    cfg_yaml = os.path.join(ws, "config.yaml")
    with open(cfg_yaml, "w") as f:
        yaml.safe_dump({"model_config": dict(CONFIG)}, f)

    init_sd = os.path.join(ws, "ref_init.pt")
    final_sd = os.path.join(ws, "ref_final.pt")
    ref_tr, ref_ev, ref_wall = train_reference(
        ws, epochs, img, batch, init_sd, final_sd, cfg_yaml)

    ours_ckpt = os.path.join(ws, "ours_best", "DetectionNet.ckpt.tar")
    our_tr, our_ev, our_wall = train_ours(
        ws, epochs, img, batch, init_sd, ours_ckpt)

    # port the torch-trained weights so BOTH finals go through the same
    # eval stack
    import torch

    from vision_conglomerate_tpu.tools.torch_port import convert_torch_state_dict
    from vision_conglomerate_tpu.train.checkpoint import save_checkpoint

    ref_ckpt = os.path.join(ws, "ref_final.ckpt.tar")
    save_checkpoint(ref_ckpt, {
        "LAST_EPOCH": epochs,
        "NETWORK_PARAMS": convert_torch_state_dict(
            torch.load(final_sd, map_location="cpu")),
        "NUM_CLASSES": 2})

    r_ours = score_map(ours_ckpt, ws, img, "ours")
    r_ref = score_map(ref_ckpt, ws, img, "ref(ported)")

    out = {
        "protocol": {
            "epochs": epochs, "img": img, "n_train": n_train, "n_val": n_val,
            "batch": batch, "lr": LR, "optimizer": "Adam",
            "loss_config": LOSS_KW, "shuffle": False, "augment": False,
            "same_init": True, "anchors": "fixed (no evolution)",
        },
        "ref_train_loss": ref_tr, "ref_eval_loss": ref_ev,
        "our_train_loss": our_tr, "our_eval_loss": our_ev,
        "ref_map50": float(r_ref["map"]),
        "our_map50": float(r_ours["map"]),
        "ref_ap_per_class": [float(v) for v in r_ref["ap_per_class"]],
        "our_ap_per_class": [float(v) for v in r_ours["ap_per_class"]],
        "ref_wall_s": ref_wall, "our_wall_s": our_wall,
    }
    with open(os.path.join(ws, "head2head.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
