"""Async input pipeline: multi-worker batch assembly + device-put prefetch.

The reference hides its host-side decode cost behind 6-25 torch DataLoader
worker PROCESSES (RCNN_bases/trainval_net.py:217, trainval_net.py:88). Here the
decode/resize hot path (PIL decode, cv2 resize) releases the GIL, so a THREAD
pool gets the same overlap without pickling the roidb into worker processes;
`RoiBatchLoader.batch_plan()` makes each batch an independent (indices, ratio,
seed) job, so completion order cannot change the data.

`device_prefetch` then keeps >= `depth` batches already transferred (and
sharded) ahead of the consumer — the double-buffered device-put of
SURVEY.md §7 — so H2D rides under the previous step's compute.
"""

from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator


class AsyncLoader:
    """Wraps RoiBatchLoader: assembles up to `num_workers` batches concurrently,
    keeps `prefetch` finished batches queued, yields in plan order."""

    def __init__(self, loader, num_workers: int = 4, prefetch: int = 2):
        import os

        # Clamp to schedulable cores: concurrent _assemble jobs on an
        # oversubscribed core collapse throughput (measured on a 1-core host:
        # serial 43 img/s, nw=1 48, nw=2 31, nw=4 9 — cache/allocator thrash
        # on the ~27 MB batch blobs). One worker still wins over serial there
        # because assembly overlaps the consumer; real TPU hosts have enough
        # cores that the requested count passes through (tools/bench_loader.py).
        try:
            cores = len(os.sched_getaffinity(0))
        except AttributeError:
            cores = os.cpu_count() or 1
        self.loader = loader
        self.num_workers = max(1, min(num_workers, cores))
        self.prefetch = max(1, prefetch)

    def __len__(self):
        return len(self.loader)

    def __iter__(self) -> Iterator:
        plan = self.loader.batch_plan()
        if not plan:
            return
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            inflight = collections.deque()
            it = iter(plan)

            def submit(job):
                return pool.submit(self.loader.assemble_job, job)

            for _ in range(self.num_workers + self.prefetch):
                job = next(it, None)
                if job is None:
                    break
                inflight.append(submit(job))
            while inflight:
                batch = inflight.popleft().result()
                job = next(it, None)
                if job is not None:
                    inflight.append(submit(job))
                yield batch


def device_prefetch(batches, put_fn, depth: int = 2):
    """Generator: apply `put_fn` (e.g. a sharded device_put) to batches `depth`
    ahead of the consumer. jax dispatch is async, so the transfer of batch
    i+depth overlaps the device compute of batch i."""
    queue = collections.deque()
    it = iter(batches)
    for _ in range(depth):
        b = next(it, None)
        if b is None:
            break
        queue.append(put_fn(b))
    while queue:
        nxt = next(it, None)
        if nxt is not None:
            queue.append(put_fn(nxt))
        yield queue.popleft()
