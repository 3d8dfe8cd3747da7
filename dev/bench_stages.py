"""Dev: per-stage timing (backbone / neck / heads / decode) + batch scaling."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from __graft_entry__ import ANCHORS, DET_CONFIG  # noqa: E402
from vision_conglomerate_tpu.nn.backbones import CSPBackBone  # noqa: E402
from vision_conglomerate_tpu.nn.necks import RepBiPAN  # noqa: E402
from vision_conglomerate_tpu.nn.blocks import EffiDecHead  # noqa: E402
from vision_conglomerate_tpu.models import DetectionNet, decode_scale  # noqa: E402


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(batch):
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (batch, 640, 640, 3), jnp.float32)

    bb = CSPBackBone(width_multiple=0.5, depth_multiple=0.3, dtype=jnp.bfloat16)
    bvars = bb.init(key, x[:1], train=False)
    bb_fn = jax.jit(lambda a: bb.apply(bvars, a.astype(jnp.bfloat16), train=False))
    fmaps = bb_fn(x)
    t_bb = timeit(bb_fn, x)

    neck = RepBiPAN(width_multiple=0.5, depth_multiple=0.3, dtype=jnp.bfloat16)
    nvars = neck.init(key, [f[:1] for f in fmaps], train=False)
    neck_fn = jax.jit(lambda f: neck.apply(nvars, f, train=False))
    nf = neck_fn(fmaps)
    t_neck = timeit(neck_fn, fmaps)

    heads = []
    hvars = []
    for i, fm in enumerate(nf[1:]):
        h = EffiDecHead(num_classes=2, width_multiple=0.5, dtype=jnp.bfloat16)
        hv = h.init(key, fm[:1], train=False)
        heads.append(h)
        hvars.append(hv)
    head_fn = jax.jit(lambda f: tuple(
        h.apply(v, fm, train=False) for h, v, fm in zip(heads, hvars, f[1:])))
    ho = head_fn(nf)
    t_heads = timeit(head_fn, nf)

    anchors = jnp.asarray(ANCHORS["sm"])
    dec_fn = jax.jit(lambda o: tuple(
        decode_scale(s, anchors, (640, 640), 2, inference=True).reshape(s.shape[0], -1, 7)
        for s in o))
    t_dec = timeit(dec_fn, ho)

    print(f"batch={batch}: backbone {t_bb*1e3:7.2f} ms | neck {t_neck*1e3:7.2f} ms | "
          f"heads {t_heads*1e3:7.2f} ms | decode {t_dec*1e3:7.2f} ms | "
          f"sum {sum([t_bb,t_neck,t_heads,t_dec])*1e3:7.2f} ms")


if __name__ == "__main__":
    for b in [int(a) for a in sys.argv[1:]] or [32]:
        main(b)
