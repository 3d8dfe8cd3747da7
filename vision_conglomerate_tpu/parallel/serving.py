"""Multi-chip data-parallel serving.

Serving scales the same way training does (SURVEY §2.3: DP is the applicable
strategy for this model family): replicate the deploy-form params over the
mesh, shard the request batch on axis 0, and jit once — XLA executes each
shard on its chip with no cross-chip communication (embarrassingly parallel;
ICI stays idle, which is exactly right for independent images).

Usage:
    serve = make_dp_serve(single_chip_fn, mesh)   # fn: batch -> pytree
    out = serve(batch)   # batch axis 0 must be divisible by mesh size
"""
from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DP_AXIS


def make_dp_serve(fn: Callable, mesh: Mesh) -> Callable:
    """Wrap a single-chip serve fn into a batch-sharded multi-chip program.

    `fn` must be shape-polymorphic over the batch axis only (true of the
    model serve paths here); closed-over params are replicated automatically
    by jit's sharding propagation.
    """
    batch_sharding = NamedSharding(mesh, P(DP_AXIS))
    jitted = jax.jit(fn, in_shardings=batch_sharding)

    def serve(batch):
        n = mesh.devices.size
        if batch.shape[0] % n != 0:
            raise ValueError(
                f"batch axis ({batch.shape[0]}) must be divisible by the mesh "
                f"size ({n}) for data-parallel serving")
        return jitted(batch)

    return serve
