"""Request micro-batcher for the serving path.

The reference serves each Flask request with its own FAISS call; on TPU a
single-query scan wastes almost the whole chip (the corpus read dominates
and is identical for every concurrent query).  The micro-batcher collects
concurrent single-query searches for a few milliseconds and issues ONE
batched device scan, then scatters per-request slices back — the same
batching that lifts the kernel from ~190 QPS (batch 1) to >24k QPS
(batch 128) at 1M×1536.

No reference equivalent (net-new serving component).  Enabled via
``SEARCH_MICROBATCH_ENABLED`` (api/app composition).
"""

from __future__ import annotations

import threading
import time
from typing import Any, Callable, List, Optional, Tuple

import numpy as np


class _Pending:
    __slots__ = ("query", "k", "event", "result", "error")

    def __init__(self, query: np.ndarray, k: int) -> None:
        self.query = query
        self.k = k
        self.event = threading.Event()
        self.result: Optional[Tuple[np.ndarray, np.ndarray]] = None
        self.error: Optional[BaseException] = None


class MicroBatcher:
    """Batches concurrent ``search(query, k)`` calls into one device call.

    ``run_batch(queries [B, D], k) -> (dists [B, k], idx [B, k])`` is the
    underlying batched search.  Requests arriving within ``window_s`` of
    each other (up to ``max_batch``) share one call; a request's k may
    differ — the batch runs at the max k and each caller gets a slice.
    """

    def __init__(
        self,
        run_batch: Callable[[np.ndarray, int], Tuple[np.ndarray, np.ndarray]],
        *,
        max_batch: int = 128,
        window_s: float = 0.003,
    ) -> None:
        self._run_batch = run_batch
        self.max_batch = int(max_batch)
        self.window_s = float(window_s)
        self._lock = threading.Condition()
        self._queue: List[_Pending] = []
        self._worker: Optional[threading.Thread] = None
        self._stopped = False
        self.batches_run = 0
        self.requests_served = 0

    # ------------------------------------------------------------------
    def _ensure_worker(self) -> None:
        if self._worker is None or not self._worker.is_alive():
            self._worker = threading.Thread(
                target=self._loop, name="search-microbatcher", daemon=True
            )
            self._worker.start()

    def close(self) -> None:
        with self._lock:
            self._stopped = True
            self._lock.notify_all()

    def _loop(self) -> None:
        while True:
            with self._lock:
                while not self._queue and not self._stopped:
                    self._lock.wait()
                if self._stopped and not self._queue:
                    return
                # linger briefly so concurrent requests can coalesce
                deadline = time.monotonic() + self.window_s
                while (
                    len(self._queue) < self.max_batch
                    and time.monotonic() < deadline
                ):
                    remaining = deadline - time.monotonic()
                    if remaining > 0:
                        self._lock.wait(timeout=remaining)
                batch = self._queue[: self.max_batch]
                del self._queue[: len(batch)]
            self._execute(batch)

    def _execute(self, batch: List[_Pending]) -> None:
        try:
            queries = np.stack([item.query for item in batch])
            k_max = max(item.k for item in batch)
            dists, idx = self._run_batch(queries, k_max)
            for row, item in enumerate(batch):
                item.result = (dists[row, : item.k], idx[row, : item.k])
        except BaseException as exc:  # propagate to every waiter
            for item in batch:
                item.error = exc
        finally:
            self.batches_run += 1
            self.requests_served += len(batch)
            for item in batch:
                item.event.set()

    # ------------------------------------------------------------------
    def search(self, query: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        pending = _Pending(np.asarray(query, np.float32), int(k))
        with self._lock:
            self._ensure_worker()
            self._queue.append(pending)
            self._lock.notify_all()
        pending.event.wait()
        if pending.error is not None:
            raise pending.error
        return pending.result


def attach_microbatcher(
    vector_index: Any, *, max_batch: int = 128, window_s: float = 0.003
) -> MicroBatcher:
    """Route a VectorIndex's unmasked single-query searches through a
    shared MicroBatcher.  Masked searches (per-query filters) bypass it."""

    def run_batch(queries: np.ndarray, k: int):
        # zero-copy path: (distances, row indices) straight from the store
        dists, idx = vector_index.raw_search_batch(queries, k)
        if dists.shape[1] < k:  # store clamped k to its live count
            pad = k - dists.shape[1]
            dists = np.pad(dists, ((0, 0), (0, pad)), constant_values=-np.inf)
            idx = np.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        return dists, idx

    batcher = MicroBatcher(run_batch, max_batch=max_batch, window_s=window_s)

    def batched_search(query_embedding, top_k):
        if vector_index.get_total_items() == 0:
            return []
        k = min(int(top_k), vector_index.get_total_items())
        dists, idx = batcher.search(np.asarray(query_embedding, np.float32), k)
        hits = []
        for d, i in zip(dists.tolist(), idx.tolist()):
            if i < 0:
                continue
            hits.append(
                {"metadata": vector_index.metadata[int(i)], "distance": float(d)}
            )
        return hits

    vector_index.search = batched_search
    vector_index._microbatcher = batcher
    return batcher
