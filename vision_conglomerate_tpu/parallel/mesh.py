"""Device-mesh data parallelism: shard_map + psum over ICI.

TPU-native replacement for the reference's NCCL/DDP stack
(/root/reference/utils/ddp_utils.py:7-42, pipeline/detection_trainer.py:48-50,
torchrun launch): instead of one OS process per accelerator with bucketed
gradient all-reduce, the train step is a single SPMD program `shard_map`-ped
over a 1-D 'dp' mesh — the batch is sharded on axis 0, params/optimizer state
are replicated, and gradients/metrics are averaged with `jax.lax.pmean`
(XLA lowers these to ICI all-reduces within a slice).

Mapping of reference concepts:
- DistributedSampler          -> batch sharded with PartitionSpec('dp')
- DDP gradient all-reduce     -> lax.pmean(grads, 'dp') inside the step
- ddp_sync_metrics (AVG)      -> lax.pmean(metrics, 'dp')
- ddp_broadcast of anchors    -> anchors are replicated params (computed once
                                 on host process 0, fed to every shard)
- rank-0 gating               -> jax.process_index() == 0
- torchrun multi-node         -> jax.distributed.initialize() (DCN between
                                 hosts, ICI within a slice)

BatchNorm keeps *local* (per-shard) batch statistics during training —
matching DDP's unsynced BatchNorm (the reference has no SyncBN) — but the
updated running stats are pmean-averaged across shards so the replicated
state stays consistent (the reference simply checkpoints rank-0's buffers;
averaging is the replication-safe equivalent and is documented as such).
"""
from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

DP_AXIS = "dp"


def maybe_initialize_distributed():
    """Multi-host bring-up: jax.distributed.initialize() when launched under a
    multi-process coordinator (replaces torchrun+NCCL process groups,
    reference utils/ddp_utils.py:7-8). No-op for single-host runs."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
        except Exception:  # already initialized or single-process
            pass


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DP_AXIS,))


def process_is_primary() -> bool:
    """Replacement for the reference's rank-0 checks (detection_trainer.py:89)."""
    return jax.process_index() == 0


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Shard array leaves along axis 0 over the dp mesh axis."""
    sharding = NamedSharding(mesh, P(DP_AXIS))
    return jax.device_put(tree, sharding)


def data_parallel_step(
    per_shard_fn: Callable,
    mesh: Mesh,
    donate_state: bool = True,
) -> Callable:
    """Wrap `per_shard_fn(state, *batch) -> (state, metrics)` into a jitted
    SPMD step: state replicated, batch sharded on axis 0.

    `per_shard_fn` must already pmean its gradients/metrics/batch_stats over
    DP_AXIS (see train/steps.py) so its outputs are replication-consistent.
    """
    def wrapper(state, *batch):
        in_specs = (P(),) + tuple(P(DP_AXIS) for _ in batch)
        fn = shard_map(
            per_shard_fn, mesh=mesh,
            in_specs=in_specs, out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(state, *batch)

    return jax.jit(wrapper, donate_argnums=(0,) if donate_state else ())
