"""Space-to-depth stem: exact equivalence with the k6/s2/p2 stem conv."""
import numpy as np

import jax
import jax.numpy as jnp

from vision_conglomerate_tpu.nn.backbones import CSPNet, space_to_depth_nhwc
from vision_conglomerate_tpu.nn.blocks import ConvBNorm
from vision_conglomerate_tpu.nn.reparam import s2d_stem_kernel


def test_s2d_layout():
    x = jnp.arange(1 * 4 * 4 * 2, dtype=jnp.float32).reshape(1, 4, 4, 2)
    y = space_to_depth_nhwc(x)
    assert y.shape == (1, 2, 2, 8)
    # plane (dy=0, dx=0) channel c=0 at (0,0) == x[0, 0, 0, 0]
    np.testing.assert_allclose(y[0, 0, 0, 0], x[0, 0, 0, 0])
    # plane (dy=1, dx=0) == x[0, 1, 0, :]
    np.testing.assert_allclose(np.asarray(y[0, 0, 0, 4:6]), np.asarray(x[0, 1, 0]))


def test_s2d_stem_kernel_equivalence():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))

    stem = ConvBNorm(8, kernel_size=6, stride=2, padding=2)
    variables = stem.init(key, x, train=False)
    y_ref = stem.apply(variables, x, train=False)

    w = variables["params"]["conv"]["kernel"]
    w2 = s2d_stem_kernel(w)
    stem2 = ConvBNorm(8, kernel_size=3, stride=1, padding=1)
    v2 = jax.tree_util.tree_map(lambda a: a, variables)
    v2 = {
        "params": {"conv": {"kernel": w2, "bias": variables["params"]["conv"]["bias"]},
                   "norm": variables["params"]["norm"]},
        "batch_stats": variables["batch_stats"],
    }
    y_s2d = stem2.apply(v2, space_to_depth_nhwc(x), train=False)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_s2d), atol=1e-5)


def test_cspnet_s2d_stem_runs():
    x = jnp.ones((1, 64, 64, 3))
    mod = CSPNet(width_multiple=0.25, depth_multiple=0.2, space_to_depth_stem=True)
    v = mod.init(jax.random.PRNGKey(0), x, train=False)
    fmaps = mod.apply(v, x, train=False)
    assert fmaps[0].shape == (1, 16, 16, 32)  # stride 4, same as standard
    assert v["params"]["conv0"]["conv"]["kernel"].shape == (3, 3, 12, 8)
