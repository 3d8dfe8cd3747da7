"""Weight-init schemes applied as pure transforms over param pytrees.

The reference applies init via `module.apply(fn)` mutation
(/root/reference/modules/detection.py:198-202 xavier + bias 0.01;
/root/reference/modules/tracknet.py:189-203 uniform(-0.05, 0.05) + bias 0 or
xavier). Here the same schemes are pure functions: init the flax model
normally, then re-sample conv kernels/biases deterministically from `rng`.

Conv kernels are identified as rank-4 leaves named 'kernel' (flax layout
(kh, kw, cin, cout)); their sibling 'bias' is filled accordingly. BatchNorm
scale/bias are left at flax defaults (1, 0), which matches torch defaults.
"""
from typing import Any, Dict

import jax
import jax.numpy as jnp


def _walk(tree: Dict[str, Any], rng: jax.Array, path: str, kernel_fn, bias_fn):
    out = {}
    is_conv = "kernel" in tree and hasattr(tree["kernel"], "ndim") and tree["kernel"].ndim == 4
    for key, val in tree.items():
        if isinstance(val, dict):
            out[key] = _walk(val, rng, path + "/" + key, kernel_fn, bias_fn)
        elif is_conv and key == "kernel":
            sub = jax.random.fold_in(rng, hash(path + "/kernel") % (2 ** 31))
            out[key] = kernel_fn(sub, val)
        elif is_conv and key == "bias":
            out[key] = bias_fn(val)
        else:
            out[key] = val
    return out


def xavier_conv_init(params: Dict[str, Any], rng: jax.Array, bias_fill: float = 0.01):
    """Xavier-uniform conv kernels, biases filled with 0.01 (detection nets)."""

    def kernel_fn(key, kernel):
        kh, kw, cin, cout = kernel.shape
        fan_in = cin * kh * kw
        fan_out = cout * kh * kw
        bound = (6.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.uniform(key, kernel.shape, kernel.dtype, -bound, bound)

    def bias_fn(bias):
        return jnp.full_like(bias, bias_fill)

    return _walk(params, rng, "", kernel_fn, bias_fn)


def uniform_conv_init(params: Dict[str, Any], rng: jax.Array,
                      low: float = -0.05, high: float = 0.05):
    """Uniform(-0.05, 0.05) conv kernels, zero biases (TrackNet 'uniform')."""

    def kernel_fn(key, kernel):
        return jax.random.uniform(key, kernel.shape, kernel.dtype, low, high)

    def bias_fn(bias):
        return jnp.zeros_like(bias)

    return _walk(params, rng, "", kernel_fn, bias_fn)


INIT_SCHEMES = {
    "xavier": xavier_conv_init,
    "uniform": uniform_conv_init,
}
