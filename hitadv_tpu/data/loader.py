"""Threaded prefetching batch loader — the per-host input pipeline.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=10)``
(`eval.py:90`): a pool of reader threads parses samples while the TPU
computes, a bounded queue holds ready batches, and (optionally) batches
are placed directly onto a device mesh with a batch sharding. Parsing of
the txt datasets can be delegated to the native C++ parser in
`hitadv_tpu/runtime` when built.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional, Sequence, Tuple

import numpy as np


def batch_iterator(dataset, batch_size: int, shuffle: bool = False,
                   drop_last: bool = False,
                   rng: Optional[np.random.RandomState] = None,
                   num_workers: int = 0,
                   prefetch: int = 4
                   ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield ``(points [B, N, C], labels [B])`` batches.

    ``dataset`` implements ``__len__``/``__getitem__ -> (points, label)``.
    ``num_workers > 0`` enables threaded sample loading with a bounded
    prefetch queue (IO/parse overlap; numpy releases the GIL in loadtxt's
    C core and the native parser entirely).
    """
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        (rng or np.random).shuffle(order)

    batches = [order[i:i + batch_size]
               for i in range(0, n, batch_size)]
    if drop_last and batches and len(batches[-1]) < batch_size:
        batches.pop()

    def assemble(idx_batch) -> Tuple[np.ndarray, np.ndarray]:
        samples = [dataset[int(i)] for i in idx_batch]
        pts = np.stack([s[0] for s in samples])
        labels = np.asarray([s[1] for s in samples], np.int32)
        return pts, labels

    if num_workers <= 0:
        for idx_batch in batches:
            yield assemble(idx_batch)
        return

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def worker(my_batches):
        try:
            for idx_batch in my_batches:
                if stop.is_set():
                    return
                q.put(assemble(idx_batch))
        except Exception as e:  # surface loader errors to the consumer
            q.put(e)

    # preserve batch order: round-robin split, reassemble via per-worker
    # queues would complicate things; instead one producer thread per
    # chunk with an ordered index queue
    threads = []
    chunks = [batches[i::num_workers] for i in range(num_workers)]
    out_queues = [queue.Queue(maxsize=prefetch) for _ in range(num_workers)]

    def chunk_worker(wid):
        try:
            for idx_batch in chunks[wid]:
                if stop.is_set():
                    return
                out_queues[wid].put(assemble(idx_batch))
        except Exception as e:
            out_queues[wid].put(e)

    for wid in range(num_workers):
        t = threading.Thread(target=chunk_worker, args=(wid,),
                             daemon=True)
        t.start()
        threads.append(t)

    try:
        for i in range(len(batches)):
            item = out_queues[i % num_workers].get()
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        stop.set()


def device_put_batches(batches: Iterable, mesh=None,
                       axis_name: str = "dp"):
    """Optionally shard each batch onto a device mesh as it is yielded."""
    if mesh is None:
        yield from batches
        return
    from hitadv_tpu.parallel import batch_sharding
    from hitadv_tpu.parallel.mesh import put_batch

    sharding = batch_sharding(mesh, axis_name)
    for pts, labels in batches:
        # put_batch handles both single-process meshes and multi-host
        # (DCN) meshes, where each host's loader yields its local shard
        yield (put_batch(pts, sharding), put_batch(labels, sharding))
