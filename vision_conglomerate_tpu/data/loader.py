"""Host-side batching loader with threaded decode + device prefetch.

The reference rides torch.utils.data.DataLoader (multiprocess workers). The
TPU-native equivalent keeps decode on host threads (PIL/cv2 release the GIL)
and overlaps H2D transfer with compute by prefetching the next batch onto the
device while the current step runs — the standard JAX input-pipeline shape.
"""
import collections
import concurrent.futures as cf
import math
from typing import Any, Callable, Iterator, Optional, Sequence

import jax
import numpy as np


class DataLoader:
    """Minimal map-style loader: shuffle, batch, collate, threaded item loads."""

    def __init__(
        self,
        dataset: Any,
        batch_size: int,
        shuffle: bool = False,
        collate_fn: Optional[Callable] = None,
        num_workers: int = 8,
        drop_last: bool = False,
        pad_last: str = "none",  # "none" | "wrap": fill the final partial
        # batch with samples wrapped from the epoch start, so every batch has
        # the same (jit-stable, mesh-divisible) shape
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.collate_fn = collate_fn or getattr(dataset, "collate_fn")
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.pad_last = pad_last
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset) / self.batch_size
        if self.pad_last == "wrap":
            return max(1, math.ceil(n))
        return math.floor(n) if self.drop_last else math.ceil(n)

    def __iter__(self) -> Iterator:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        if self.pad_last == "wrap":
            total = len(self)
            need = total * self.batch_size
            if need > order.size:
                order = np.concatenate(
                    [order, np.resize(order, need - order.size)])
        self._epoch += 1

        n_batches = len(self)
        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = collections.deque()

            def submit(batch_idx):
                lo = batch_idx * self.batch_size
                idxs = order[lo: lo + self.batch_size]
                futures = [pool.submit(self.dataset.__getitem__, int(i)) for i in idxs]
                pending.append(futures)

            ahead = 2  # batches decoded ahead of consumption
            for i in range(min(ahead, n_batches)):
                submit(i)
            for i in range(n_batches):
                if i + ahead < n_batches:
                    submit(i + ahead)
                futures = pending.popleft()
                yield self.collate_fn([f.result() for f in futures])


def prefetch_to_device(iterator: Iterator, size: int = 2, device=None,
                       host_indices=()) -> Iterator:
    """Move batches to device `size` steps ahead so H2D overlaps compute.

    size=0 degrades to a synchronous device_put per batch (no lookahead) —
    the A/B baseline arm in dev/bench_prefetch.py.

    host_indices: positions in a tuple/list batch to leave on host (data the
    loop consumes host-side — shipping it would be a wasted round trip).

    A batch whose leading dim is not divisible by a NamedSharding's mesh
    (e.g. a drop_last=False ragged tail on a multi-device mesh) falls back
    to an unsharded put — jit reshards it on entry instead of device_put
    raising."""
    queue = collections.deque()

    def put_leaf(x):
        if not isinstance(x, np.ndarray):
            return x
        dev = device
        mesh = getattr(device, "mesh", None)
        if mesh is not None and x.ndim and x.shape[0] % mesh.size != 0:
            dev = None
        return jax.device_put(x, dev)

    def put(batch):
        if host_indices and isinstance(batch, (tuple, list)):
            queue.append(tuple(
                el if i in host_indices else jax.tree_util.tree_map(put_leaf, el)
                for i, el in enumerate(batch)))
        else:
            queue.append(jax.tree_util.tree_map(put_leaf, batch))

    it = iter(iterator)
    try:
        for _ in range(size):
            put(next(it))
    except StopIteration:
        pass
    while True:
        try:
            put(next(it))
        except StopIteration:
            break
        yield queue.popleft()
    while queue:
        yield queue.popleft()
