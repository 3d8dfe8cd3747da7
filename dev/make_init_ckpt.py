"""Dev: save a random-init DetectionNet checkpoint in the reference manifest
format (LAST_EPOCH / NETWORK_PARAMS / NUM_CLASSES).

Serving-throughput benches (dev/bench_serve_e2e.py) need a loadable
weights file but not trained weights — conv throughput is weight-value
independent. Keeps the e2e CLI path (load -> deploy_transform -> jit)
identical to a real user run.

Usage: python dev/make_init_ckpt.py <out.ckpt.tar> [config.yaml] [anchors.yaml] [num_classes]
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
    out = sys.argv[1]
    config_path = sys.argv[2] if len(sys.argv) > 2 else "configs/detection/config.yaml"
    anchors_path = sys.argv[3] if len(sys.argv) > 3 else "configs/detection/anchors.yaml"
    num_classes = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from vision_conglomerate_tpu.models import DetectionNet
    from vision_conglomerate_tpu.train.checkpoint import save_checkpoint
    from vision_conglomerate_tpu.utils import load_yaml

    config = load_yaml(config_path)
    anchors = load_yaml(anchors_path)["anchors"]  # {"sm"/"md"/"lg": [[w,h]x3]}
    model = DetectionNet(
        num_classes=num_classes, config=config["model_config"],
        anchors=anchors, dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3), jnp.float32),
                   train=False)
    save_checkpoint(out, {
        "LAST_EPOCH": 0,
        "NETWORK_PARAMS": {"params": v["params"], "batch_stats": v["batch_stats"]},
        "NUM_CLASSES": num_classes,
    })
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
