"""CPU-scale cap-policy sweep: dice vs (cap, policy) under real cap pressure.

VERDICT r2 item #10 follow-up evidence. A crowded synthetic set (~12
instances/img at 64 px) makes `seg_candidates_per_image` bind hard; each arm
trains with a different (cap, cap_policy) and is then evaluated with ONE
shared protocol: an uncapped (cap >= lattice) eval pass over a held-out
split, so arms are compared on all instances rather than on whatever subset
their own cap kept. The full-size (640 px) sweep runs on hardware
(/tmp/segchain run2b/run3); this is the reproducible CPU-scale signal.

Usage: python dev/sweep_cap_policy_cpu.py [epochs]
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")
import dev.cpu  # noqa: F401  (forces the CPU backend)

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
ARMS = [
    (4, "first"), (4, "area"), (4, "random"),
    (16, "first"), (16, "random"),
]

MODEL_CONFIG = {
    "train_anchors": True,
    "backbone": "CSPBackBone",
    "neck": "RepBiPAN",
    "head": "EffiDecHead",
    "cspbackbone_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
    "repbipan_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
    "effidechead_config": {"width_multiple": 0.5},
    "num_masks": 8,
    "protos_config": {"c_h": 32},
}
ANCHORS = {
    "sm": [[0.06, 0.06], [0.1, 0.1], [0.14, 0.14]],
    "md": [[0.18, 0.18], [0.24, 0.24], [0.3, 0.3]],
    "lg": [[0.4, 0.4], [0.5, 0.5], [0.6, 0.6]],
}


def write_crowded_dataset(root, n_imgs, seed, n_inst=12, size=64):
    """Images with ~n_inst small axis-aligned square instances (2 classes)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for i in range(n_imgs):
        img = np.zeros((size, size, 3), np.uint8)
        img[:] = rng.integers(0, 40, size=(size, size, 3), dtype=np.uint8)
        lines = []
        for _ in range(n_inst):
            cls = int(rng.integers(0, 2))
            s = rng.uniform(0.08, 0.18)  # side, normalized
            cx = rng.uniform(s / 2 + 0.02, 1 - s / 2 - 0.02)
            cy = rng.uniform(s / 2 + 0.02, 1 - s / 2 - 0.02)
            x0, x1 = cx - s / 2, cx + s / 2
            y0, y1 = cy - s / 2, cy + s / 2
            px = slice(int(y0 * size), int(y1 * size))
            py = slice(int(x0 * size), int(x1 * size))
            color = (220, 60, 60) if cls == 0 else (60, 60, 220)
            img[px, py] = color
            lines.append(
                f"{cls} {x0:.4f} {y0:.4f} {x1:.4f} {y0:.4f} "
                f"{x1:.4f} {y1:.4f} {x0:.4f} {y1:.4f}")
        Image.fromarray(img).save(os.path.join(root, f"img_{i}.png"))
        with open(os.path.join(root, f"img_{i}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")


def run_arm(train_dl, eval_dl, cap, policy, epochs):
    import jax.numpy as jnp  # noqa: F401

    from vision_conglomerate_tpu.losses import SegmentationLossConfig
    from vision_conglomerate_tpu.models import SegmentationNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import (TrainSegmentationPipeline,
                                               make_optimizer)

    model = SegmentationNet(num_classes=2, config=MODEL_CONFIG, anchors=ANCHORS)
    tx, _ = make_optimizer({"name": "Adam", "lr": 2e-3})
    pipe = TrainSegmentationPipeline(
        model,
        SegmentationLossConfig(num_classes=2, seg_candidates_per_image=cap,
                               cap_policy=policy),
        tx, mesh=make_mesh(1), sample_input_shape=(64, 64, 3), seed=7)
    dropped = None
    for _ in range(epochs):
        m = pipe.train(train_dl)
        dropped = m.get("seg_dropped_candidates")

    # shared eval protocol: uncapped (cap >= lattice keeps every candidate)
    eval_pipe = TrainSegmentationPipeline(
        model,
        SegmentationLossConfig(num_classes=2, seg_candidates_per_image=4096,
                               cap_policy="first"),
        tx, mesh=make_mesh(1), sample_input_shape=(64, 64, 3), seed=7)
    eval_pipe.state = pipe.state
    em = eval_pipe.evaluate(eval_dl)
    return em["dice_score"], em["seg_loss"], dropped


def main():
    from vision_conglomerate_tpu.data import DataLoader, SegmentationDataset

    tmp = tempfile.mkdtemp(prefix="capsweep_")
    write_crowded_dataset(os.path.join(tmp, "train"), 32, seed=0)
    write_crowded_dataset(os.path.join(tmp, "valid"), 12, seed=1)
    mk = lambda split, shuffle: DataLoader(  # noqa: E731
        SegmentationDataset(os.path.join(tmp, split), img_ext="png",
                            img_wh=(64, 64), max_labels=16,
                            overlap_masks=True, mask_store_wh=(16, 16)),
        batch_size=4, shuffle=shuffle, num_workers=2)
    train_dl, eval_dl = mk("train", True), mk("valid", False)

    print(f"cap_policy sweep: {EPOCHS} epochs/arm, crowded 64px synthetic "
          f"(12 inst/img), eval = uncapped dice on held-out split")
    print(f"{'cap':>4} {'policy':>7} {'eval_dice':>10} {'eval_segloss':>13} "
          f"{'dropped/step(train)':>20}")
    for cap, policy in ARMS:
        dice, segloss, dropped = run_arm(train_dl, eval_dl, cap, policy, EPOCHS)
        print(f"{cap:>4} {policy:>7} {dice:>10.4f} {segloss:>13.4f} "
              f"{dropped if dropped is None else round(dropped, 1):>20}")


if __name__ == "__main__":
    main()
