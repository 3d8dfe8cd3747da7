"""Reference (torch) checkpoint -> flax variables converter.

Lets users of the reference framework migrate trained weights
(`NETWORK_PARAMS` state dicts from /root/reference pipeline checkpoints,
detection_trainer.py:64-86) into this framework. Because the flax module
tree was designed to mirror the reference attribute names, conversion is a
mechanical key-path rewrite plus layout transposes:

- conv weight (O, I, kh, kw)        -> kernel (kh, kw, I, O)
- conv-transpose weight (I, O, kh, kw) -> kernel (kh, kw, I, O) [flax
  transpose_kernel=False convention: (kh, kw, in, out)]
- BatchNorm weight/bias             -> params norm/BatchNorm_0 scale/bias
- BatchNorm running_mean/var        -> batch_stats .../mean, var
- nn.Sequential / ModuleList indices -> name_{i} (e.g. bottlenecks.0 ->
  bottlenecks_0, head.0 -> head_0, conv_1_3_4.0 -> conv_1_3_4_0)
- TrackNet base _enc_modules.N / _dec_modules.N -> enc_N / dec_N
- torchvision ResNet layerL.B (+ downsample.0/1) -> layerL_B
  (+ downsample_conv / downsample_bn)

Input tensors may be torch tensors or numpy arrays. Returns
{"params": ..., "batch_stats": ...} ready for `model.apply`.
"""
from typing import Any, Dict, Tuple

import numpy as np


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _set(tree: Dict[str, Any], path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _rewrite_path(parts):
    """Merge numeric segments into their parent module name."""
    out = []
    for part in parts:
        if part.isdigit():
            prev = out.pop()
            if prev == "_enc_modules":
                out.append(f"enc_{part}")
            elif prev == "_dec_modules":
                out.append(f"dec_{part}")
            elif prev == "downsample":
                # resolved by the caller based on leaf kind
                out.append(("downsample", int(part)))
            else:
                out.append(f"{prev}_{part}")
        else:
            out.append(part)
    return out


def convert_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a reference NETWORK_PARAMS state dict to flax variables."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    # group leaves by module path so BN modules are recognized by their
    # running stats
    modules: Dict[Tuple, Dict[str, np.ndarray]] = {}
    for key, val in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        mod_path = tuple(_rewrite_path(parts[:-1]))
        modules.setdefault(mod_path, {})[leaf] = _to_np(val)

    for mod_path, leaves in modules.items():
        # resolve torchvision downsample.{0,1}
        resolved = []
        for seg in mod_path:
            if isinstance(seg, tuple) and seg[0] == "downsample":
                is_bn = "running_mean" in leaves
                resolved.append("downsample_bn" if is_bn else "downsample_conv")
            else:
                resolved.append(seg)
        mod_path = tuple(resolved)

        if "running_mean" in leaves:  # BatchNorm module
            base = mod_path + ("BatchNorm_0",)
            _set(params, base + ("scale",), leaves["weight"])
            _set(params, base + ("bias",), leaves["bias"])
            _set(batch_stats, base + ("mean",), leaves["running_mean"])
            _set(batch_stats, base + ("var",), leaves["running_var"])
            continue

        if not mod_path:  # top-level parameters (anchors)
            for leaf, val in leaves.items():
                _set(params, (leaf,), val)
            continue

        weight = leaves.get("weight")
        if weight is not None and weight.ndim == 4:
            is_transpose = mod_path[-1] == "conv_transpose"
            if is_transpose:
                # torch ConvTranspose2d weight (I, O, kh, kw)
                kernel = weight.transpose(2, 3, 0, 1)
            else:
                # torch Conv2d weight (O, I, kh, kw) -> (kh, kw, I, O)
                kernel = weight.transpose(2, 3, 1, 0)
            _set(params, mod_path + ("kernel",), kernel)
            if "bias" in leaves:
                _set(params, mod_path + ("bias",), leaves["bias"])
            continue

        # anything else (1D/2D plain parameters)
        for leaf, val in leaves.items():
            name = "kernel" if leaf == "weight" else leaf
            _set(params, mod_path + (name,), val)

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables


def main():
    """CLI: migrate a reference .pth.tar checkpoint to this framework.

    Usage: python -m vision_conglomerate_tpu.tools.torch_port in.pth.tar out.ckpt.tar
    Reads the torch manifest {LAST_EPOCH, NETWORK_PARAMS, NUM_CLASSES, ...}
    and writes the equivalent flax manifest consumable by the inference CLIs.

    NOTE: a reference checkpoint was trained with branch-activated RepVGG
    blocks, so the migrated model must run with repvgg_branch_act: "silu" in
    its neck config (the module default).
    """
    import argparse

    import torch

    from ..train.checkpoint import save_checkpoint

    parser = argparse.ArgumentParser(description="reference->flax checkpoint migration")
    parser.add_argument("input", help="reference .pth.tar checkpoint")
    parser.add_argument("output", help="output .ckpt.tar path")
    args = parser.parse_args()

    manifest = torch.load(args.input, map_location="cpu", weights_only=False)
    variables = convert_torch_state_dict(manifest["NETWORK_PARAMS"])
    out = {
        "LAST_EPOCH": manifest.get("LAST_EPOCH", 0),
        "NETWORK_PARAMS": variables,
    }
    if "NUM_CLASSES" in manifest:
        out["NUM_CLASSES"] = manifest["NUM_CLASSES"]
    if "METRICS" in manifest:
        out["METRICS"] = manifest["METRICS"]
    save_checkpoint(args.output, out)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
