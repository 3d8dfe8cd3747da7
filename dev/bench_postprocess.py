"""Decompose the serve postprocess cost at batch 128 (sizing for VERDICT r2).

Pieces: decode-only forward is ~40 ms/batch and full serve ~50 ms — where do
the ~10 ms go? Candidates: exact top_k(25200 -> 2048), the (P,P) IoU
materialization + fixed-point matvecs, compaction.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from vision_conglomerate_tpu.ops.nms import batched_nms  # noqa: E402

B, N, P = 128, 25200, 2048
ITERS = 20


def timed(fn, *args):
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1000


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    # realistic score distribution: most below threshold, a few hundred above
    logits = jax.random.normal(k1, (B, N)) * 2.0 - 4.0
    scores = jax.nn.sigmoid(logits)
    xy = jax.random.uniform(k2, (B, N, 2)) * 600
    wh = jax.random.uniform(jax.random.PRNGKey(2), (B, N, 2)) * 60 + 4
    boxes = jnp.concatenate([xy, xy + wh], axis=-1)
    classes = (jax.random.uniform(jax.random.PRNGKey(3), (B, N)) > 0.5).astype(jnp.int32)

    ms = timed(jax.jit(lambda s: jax.lax.top_k(s, P)), scores)
    print(f"exact top_k {N}->{P}:        {ms:7.3f} ms/batch")

    ms = timed(jax.jit(lambda s: jax.lax.approx_max_k(s, P)), scores)
    print(f"approx_max_k {N}->{P}:       {ms:7.3f} ms/batch")

    ms = timed(jax.jit(lambda s: jax.lax.approx_max_k(s, P, recall_target=0.99)), scores)
    print(f"approx_max_k r=0.99:         {ms:7.3f} ms/batch")

    fn = jax.jit(lambda b, s, c: batched_nms(
        b, s, c, iou_threshold=0.35, score_threshold=0.3,
        max_detections=300, pre_nms_topk=P, class_agnostic=True))
    ms = timed(fn, boxes, scores, classes)
    print(f"full batched_nms (xla):      {ms:7.3f} ms/batch")

    n_above = float((scores > 0.3).sum() / B)
    print(f"(avg candidates above 0.3 threshold: {n_above:.0f}/img)")


if __name__ == "__main__":
    main()
