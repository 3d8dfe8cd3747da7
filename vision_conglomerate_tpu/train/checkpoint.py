"""Checkpoint/resume with the reference's manifest semantics.

Artifacts mirror /root/reference/pipeline/detection_trainer.py:64-141:
- snapshot: {LAST_EPOCH, NETWORK_PARAMS, OPTIMIZER_PARAMS,
  METRICS{TRAIN, EVAL}, NUM_CLASSES [, LR_SCHEDULER_PARAMS]} at
  saved_model/<task>/checkpoints/<unix_ts>/<name>-<epoch>-<datetime>.ckpt.tar
- best model (params only) at saved_model/<task>/best_model/<Class>.ckpt.tar
- a config.yaml copy (with num_keypoints injected) beside both, which the
  inference CLIs reload as their config source.

NETWORK_PARAMS here is the flax variables dict {'params': ...,
'batch_stats': ...} (anchors ride inside params exactly as the reference's
nn.Parameter anchors ride in the state_dict, detection.py:36-38).
Serialization is numpy-pickle of the pure pytrees — process-0-only writes,
every process reads (the DDP-parity rule, detection_trainer.py:107-141).
"""
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, manifest: Dict[str, Any]):
    """Atomic write: serialize to <path>.tmp then rename, so an interrupted
    save never corrupts the latest checkpoint (crash-safe resume)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(manifest), f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def resolve_checkpoint_path(path: str) -> str:
    """Accept either a .ckpt.tar file or a directory. For a directory,
    resolve to the newest *.ckpt.tar under it (recursing one level into the
    run-timestamp subdirs of saved_model/<task>/checkpoints/), so
    `--checkpoint_path saved_model/detection/checkpoints` resumes from the
    latest snapshot without spelling out the datetime-stamped filename."""
    if not os.path.isdir(path):
        return path
    cands = []
    for root, _dirs, files in os.walk(path):
        cands += [os.path.join(root, f) for f in files if f.endswith(".ckpt.tar")]
    if not cands:
        raise FileNotFoundError(
            f"Checkpoint path {path} is a directory with no *.ckpt.tar under it")
    return max(cands, key=os.path.getmtime)


def load_checkpoint(path: str) -> Dict[str, Any]:
    if not os.path.exists(path):
        raise FileNotFoundError(f"Checkpoint path {path} does not exist")
    path = resolve_checkpoint_path(path)
    with open(path, "rb") as f:
        return pickle.load(f)


# ------------------------------------------------------------------ orbax
# Optional production backend: orbax handles async, atomic, multi-host and
# sharded-array checkpoints. The pytree payload is identical; the pickle
# format above stays the default for its zero-dependency portability.

def save_checkpoint_orbax(path: str, manifest: Dict[str, Any]):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), _to_numpy(manifest), force=True)


def load_checkpoint_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))
