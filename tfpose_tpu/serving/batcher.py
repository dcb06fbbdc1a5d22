"""Dynamic micro-batching for the serving stack.

The reference ROS node (``scripts/broadcaster_ros.py``) processes one
frame per callback; with many publishers the estimator serialises.
On TPU the forward amortises strongly with batch (BASELINE.md: thin
b=16 is ~1.5x the b=1 throughput/img), so the service-side win is to
coalesce concurrent requests into one device program.

``DynamicBatcher`` collects requests from any number of threads and
flushes a batch when either ``max_batch`` requests are waiting or the
oldest has waited ``max_wait_ms``. Batches are PADDED to ``max_batch``
by repeating the last frame: the jitted batched pipeline then compiles
for exactly one batch shape (compile-per-size would dwarf any win —
remote TPU compiles take minutes), and pad results are dropped before
futures resolve. A lone request under no concurrency costs one padded
forward — on-chip that is still cheaper than two b=1 dispatches for
any concurrency >= 2, and ``max_wait_ms`` bounds the added latency.
"""

from __future__ import annotations

import logging
import queue
import threading
from concurrent.futures import Future
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger("tfpose_tpu.serving")


class DynamicBatcher:
    """Coalesce concurrent inference requests into padded batches.

    ``submit(img)`` returns a Future resolving to ``List[Human]``.
    """

    def __init__(self, estimator, max_batch: int = 8,
                 max_wait_ms: float = 5.0, upsample_size: float = 4.0,
                 pad_to_max: bool = True):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.estimator = estimator
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.ratio = upsample_size
        self.pad_to_max = pad_to_max
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        # observability: batch-size histogram {size: count}
        self.batch_sizes: dict = {}

    def submit(self, img: np.ndarray) -> "Future":
        if self._stop.is_set():
            raise RuntimeError("batcher stopped")
        fut: Future = Future()
        self._q.put((img, fut))
        return fut

    def _collect(self) -> List:
        """Block for one request, then gather until full or deadline."""
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        items = [first]
        deadline = _now() + self.max_wait
        while len(items) < self.max_batch:
            remaining = deadline - _now()
            if remaining <= 0:
                break
            try:
                items.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return items

    def _run(self):
        while not self._stop.is_set():
            items = self._collect()
            if not items:
                continue
            imgs = [im for im, _ in items]
            n = len(imgs)
            if self.pad_to_max and n < self.max_batch:
                imgs = imgs + [imgs[-1]] * (self.max_batch - n)
            try:
                results = self.estimator.inference_batch(
                    imgs, upsample_size=self.ratio)
            except Exception as exc:  # resolve, don't wedge clients
                for _, fut in items:
                    fut.set_exception(exc)
                continue
            self.batch_sizes[n] = self.batch_sizes.get(n, 0) + 1
            for (_, fut), humans in zip(items, results):
                fut.set_result(humans)

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5.0)
        # fail anything still queued
        while True:
            try:
                _, fut = self._q.get_nowait()
            except queue.Empty:
                break
            fut.set_exception(RuntimeError("batcher stopped"))


def _now() -> float:
    import time

    return time.monotonic()
