"""RepVGG re-parameterisation as a pure transform over variable pytrees.

The reference mutates modules in place (`RepVGGBlock.toggle_inference_mode`,
/root/reference/modules/common.py:181-229): per branch it folds BatchNorm into
the conv (w' = w*gamma/std, b' = beta - mu*gamma/std), zero-pads the 1x1
branch to 3x3, expresses the identity branch as a one-hot 1x1 kernel, and sums
into a single 3x3 conv.

Here the same math is a *function* over (params, batch_stats): it returns the
variables for the same model constructed with `deploy=True`, where every
RepVGGBlock is a single fused 3x3 conv. Train-form checkpoints remain the
source of truth; deploy-form params are derived on demand (the reference's
shipped CLIs never call `.inference()` — detection.py:204-213 exists but is
unused by inference_det.py:286 — whereas this framework uses the deploy form
as the default serving path, which is where the TPU perf win lives).
"""
from typing import Any, Dict, Tuple

import jax.numpy as jnp

BN_EPS = 1e-5


def _fold_conv_bn(kernel: jnp.ndarray, bn_params: Dict[str, jnp.ndarray],
                  bn_stats: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold BN into a conv kernel (flax layout (kh, kw, cin, cout))."""
    gamma = bn_params["scale"]
    beta = bn_params["bias"]
    mu = bn_stats["mean"]
    var = bn_stats["var"]
    std = jnp.sqrt(var + BN_EPS)
    w = kernel * (gamma / std)  # broadcast over cout (last axis)
    b = beta - mu * gamma / std
    return w, b


def s2d_stem_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Rearrange a k6/s2/p2 stem kernel (6, 6, C, O) into the equivalent
    k3/s1/p1 kernel (3, 3, 4C, O) over space-to-depth input.

    Derivation: out[i,j] = sum_{u,v,c} w[u,v,c] x[2i-2+u, 2j-2+v, c]; writing
    u = 2a + dy (dy = parity) maps each tap onto plane (dy, dx) at k3 tap
    (a, b) with pad 1 — exact, incl. the padding band.
    """
    c = w.shape[2]
    out = jnp.zeros((3, 3, 4 * c) + w.shape[3:], w.dtype)
    for dy in range(2):
        for dx in range(2):
            plane = (dy * 2 + dx) * c
            out = out.at[:, :, plane:plane + c].set(w[dy::2, dx::2])
    return out


def _is_repvgg_params(node: Any) -> bool:
    return (
        isinstance(node, dict)
        and "conv3x3" in node
        and "conv1x1" in node
        and isinstance(node.get("conv3x3"), dict)
        and "conv" in node["conv3x3"]
    )


def _fuse_block(p: Dict[str, Any], s: Dict[str, Any]) -> Tuple[Dict[str, Any], jnp.ndarray, jnp.ndarray]:
    w3, b3 = _fold_conv_bn(
        p["conv3x3"]["conv"]["kernel"],
        p["conv3x3"]["norm"]["BatchNorm_0"],
        s["conv3x3"]["norm"]["BatchNorm_0"],
    )
    w1, b1 = _fold_conv_bn(
        p["conv1x1"]["conv"]["kernel"],
        p["conv1x1"]["norm"]["BatchNorm_0"],
        s["conv1x1"]["norm"]["BatchNorm_0"],
    )
    w = w3 + jnp.pad(w1, ((1, 1), (1, 1), (0, 0), (0, 0)))
    b = b3 + b1
    if "identity" in p:
        cin = w3.shape[2]
        eye = jnp.zeros((1, 1, cin, cin), dtype=w3.dtype).at[0, 0, jnp.arange(cin), jnp.arange(cin)].set(1.0)
        wi, bi = _fold_conv_bn(eye, p["identity"]["BatchNorm_0"], s["identity"]["BatchNorm_0"])
        w = w + jnp.pad(wi, ((1, 1), (1, 1), (0, 0), (0, 0)))
        b = b + bi
    return {"conv_reparam": {"kernel": w, "bias": b}}


def _is_conv_bn_params(node: Any) -> bool:
    if not isinstance(node, dict) or "norm" not in node:
        return False
    conv = node.get("conv") or node.get("conv_transpose")
    return (
        isinstance(conv, dict)
        and "kernel" in conv
        and getattr(conv["kernel"], "ndim", 0) == 4
        and isinstance(node["norm"], dict)
        and "BatchNorm_0" in node["norm"]
    )


def fold_conv_bn_params(params: Dict[str, Any], batch_stats: Dict[str, Any]):
    """Fold every ConvBNorm/ConvTransposeBNorm's BatchNorm into its conv.

    Deploy-time transform beyond RepVGG: BN with running stats is an affine
    per-channel map, so conv -> BN -> act becomes conv' -> act with
    w' = w * gamma/std and b' = (b - mean) * gamma/std + beta. The resulting
    params are applied under `nn.blocks.bn_folding()` (which makes the
    modules skip their norm). Only valid for batchnorm_first=True modules —
    every ConvBNorm in this model zoo (matching the reference defaults).

    Returns (folded_params, remaining_batch_stats).
    """

    def fold_one(p, s):
        conv_key = "conv" if "conv" in p else "conv_transpose"
        conv = dict(p[conv_key])
        kernel = conv["kernel"]
        bnp = p["norm"]["BatchNorm_0"]
        bns = s["norm"]["BatchNorm_0"]
        gamma = bnp["scale"]
        beta = bnp["bias"]
        mu = bns["mean"]
        std = jnp.sqrt(bns["var"] + BN_EPS)
        conv["kernel"] = kernel * (gamma / std)
        bias = conv.get("bias", jnp.zeros_like(mu))
        conv["bias"] = (bias - mu) * (gamma / std) + beta
        out = {k: v for k, v in p.items() if k != "norm"}
        out[conv_key] = conv
        return out

    def recurse(p, s):
        new_p, new_s = {}, {}
        for key, val in p.items():
            sval = s.get(key, {}) if isinstance(s, dict) else {}
            if _is_conv_bn_params(val):
                new_p[key] = fold_one(val, sval)
            elif isinstance(val, dict):
                rp, rs = recurse(val, sval)
                new_p[key] = rp
                if rs:
                    new_s[key] = rs
            else:
                new_p[key] = val
        if isinstance(s, dict):
            for key, val in s.items():
                if key not in p:
                    new_s[key] = val
        return new_p, new_s

    if _is_conv_bn_params(params):  # a bare ConvBNorm/ConvTransposeBNorm
        return fold_one(params, batch_stats), {}
    return recurse(params, batch_stats)


def deploy_transform(params: Dict[str, Any], batch_stats: Dict[str, Any],
                     fuse_repvgg: bool = True):
    """Full serving transform: RepVGG branch fusion + global conv-BN folding.

    fuse_repvgg=True requires canonical (activation-free-branch) RepVGG
    blocks (repvgg_branch_act=None in neck configs); apply the result with
    deploy=True modules. With reference-parity branch activations
    (fuse_repvgg=False), RepVGG blocks keep their 3 branches but every
    conv-BN pair is still folded; apply with deploy=False modules. Either
    way, run apply under `nn.blocks.bn_folding()`.
    """
    if fuse_repvgg:
        params, batch_stats = reparameterize_params(params, batch_stats)
    return fold_conv_bn_params(params, batch_stats)


def reparameterize_params(params: Dict[str, Any], batch_stats: Dict[str, Any]):
    """Transform train-form variables to deploy-form.

    Returns (deploy_params, deploy_batch_stats): every RepVGGBlock subtree is
    replaced by a fused `conv_reparam` conv; all other subtrees (incl. their
    BatchNorm stats, still used in eval mode) pass through unchanged.
    """
    if _is_repvgg_params(params):  # a bare RepVGGBlock module
        return _fuse_block(params, batch_stats), {}

    def recurse(p, s):
        new_p, new_s = {}, {}
        for key, val in p.items():
            sval = s.get(key, {}) if isinstance(s, dict) else {}
            if _is_repvgg_params(val):
                new_p[key] = _fuse_block(val, sval)
                # fused conv has no batch stats
            elif isinstance(val, dict):
                rp, rs = recurse(val, sval)
                new_p[key] = rp
                if rs:
                    new_s[key] = rs
            else:
                new_p[key] = val
        # carry over stats-only subtrees (BN living beside convs)
        if isinstance(s, dict):
            for key, val in s.items():
                if key not in new_s and key in p and not _is_repvgg_params(p[key]):
                    if not isinstance(p.get(key), dict):
                        new_s[key] = val
                elif key not in p:
                    new_s[key] = val
        return new_p, new_s

    return recurse(params, batch_stats)
