"""Cross-request query coalescing for the REST server.

The reference serves each request independently: FastAPI handler -> one
text-tower forward at batch 1 -> one faiss search at batch 1
(/root/reference/api/routes.py:1395-1442). On TPU both choke points are
much cheaper per query when batched — the exact scan is HBM-bound, so one
database sweep amortises across every query in the batch (measured: 1.19 ms
solo vs ~0.8 ms/query at batch 16, BENCHMARKS.md), and the text tower's
step time is nearly flat in batch size up to the MXU's fill point.

This module coalesces concurrent requests into single device dispatches
with a leader/follower protocol (continuous batching, no dedicated worker
thread and no added latency when idle):

- every submitting thread enqueues its item, then tries to become leader;
- the leader drains everything currently queued (up to ``max_batch``),
  runs the batch function once, and publishes per-item results;
- threads that arrive while a batch is on the device queue up and are
  drained by the next leader the moment the device frees.

Under no contention a request runs immediately at batch 1 — identical
behaviour to the uncoalesced path. Under load, batching emerges
automatically and device dispatches scale ~O(active_batches) instead of
O(requests).

Batch functions must be pure per-item (item i's result depends only on
payload i) so coalescing cannot change any response; the engine pads query
batches to powers of two before jit dispatch to bound the number of
distinct compiled graphs (remote compiles are expensive — CLAUDE.md).
"""

from __future__ import annotations

import threading
from collections import deque
from typing import Callable, List, Sequence


class _Item:
    __slots__ = ("payload", "event", "result", "error")

    def __init__(self, payload):
        self.payload = payload
        self.event = threading.Event()
        self.result = None
        self.error = None


class Coalescer:
    """Leader/follower micro-batcher around ``run_batch``.

    ``run_batch(payloads: list) -> list`` must return one result per
    payload, in order. ``submit`` blocks until this thread's item has been
    executed (by this thread as leader, or by another leader) and returns
    its result, re-raising any batch exception.
    """

    def __init__(self, run_batch: Callable[[List], Sequence], *,
                 max_batch: int = 16, name: str = "",
                 finalize: Callable | None = None):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.run_batch = run_batch
        self.max_batch = int(max_batch)
        self.name = name
        #: two-phase mode: ``run_batch`` only DISPATCHES (returns an opaque
        #: batch handle, e.g. unrealised jax arrays) and each waiter calls
        #: ``finalize(handle, i, payload)`` in its own thread OUTSIDE the
        #: execution lock. This keeps the leader's critical section at
        #: dispatch cost so device work pipelines across batches and result
        #: readbacks overlap — measured on the tunnelled v5e, holding the
        #: lock through a synchronous readback serialised the server to
        #: ~1 batch per host<->device roundtrip and HALVED throughput vs
        #: uncoalesced (scripts/bench_serve_load.py, BENCHMARKS.md).
        self.finalize = finalize
        self._queue: deque[_Item] = deque()
        self._mu = threading.Lock()        # guards _queue and counters
        self._exec = threading.Lock()      # serialises device execution
        # stats (read by tests and /info consumers; racy reads are fine)
        self.num_batches = 0
        self.num_items = 0
        self.max_seen_batch = 0

    # ------------------------------------------------------------------
    def submit(self, payload):
        item = _Item(payload)
        with self._mu:
            self._queue.append(item)
        # Starvation-free leader election (round-4 fix): the original loop
        # BLOCKED on _exec even when this item had already been executed by
        # another leader — a thread parked in Lock.acquire() whose event was
        # set mid-wait still had to WIN the contended lock once just to
        # discover it, and pthread locks barge (a fresh submitter often
        # grabs a just-released lock ahead of older waiters). Under a
        # closed-loop client pool on one core that starved unlucky requests
        # for dozens of batch cycles: the measured p95 was 1,077 ms against
        # a 94 ms p50 (BENCHMARKS.md "Coalescing under load"). Now a thread
        # only leads OPPORTUNISTICALLY (non-blocking acquire) and otherwise
        # waits on its OWN event, which wakes it the instant its batch is
        # published — a served thread never touches the lock again. The
        # 2 ms wait timeout only bounds the rare race where the lock frees
        # just after every queued waiter entered its wait.
        while not item.event.is_set():
            if self._exec.acquire(blocking=False):
                try:
                    while not item.event.is_set():
                        # our item is queued, so each batch drains >= 1
                        # item and this terminates within
                        # ceil(position / max_batch) batches
                        self._run_one_batch()
                finally:
                    self._exec.release()
                break
            item.event.wait(0.002)
        if item.error is not None:
            raise item.error
        if self.finalize is not None:
            # outside _exec: concurrent finalizers overlap their readbacks
            handle, i = item.result
            return self.finalize(handle, i, item.payload)
        return item.result

    # ------------------------------------------------------------------
    def _run_one_batch(self):
        with self._mu:
            n = min(len(self._queue), self.max_batch)
            batch = [self._queue.popleft() for _ in range(n)]
        if not batch:
            return
        try:
            if self.finalize is not None:
                handle = self.run_batch([it.payload for it in batch])
                for i, it in enumerate(batch):
                    it.result = (handle, i)
            else:
                results = self.run_batch([it.payload for it in batch])
                if len(results) != len(batch):
                    raise RuntimeError(
                        f"coalesced batch fn returned {len(results)} results "
                        f"for {len(batch)} payloads"
                    )
                for it, res in zip(batch, results):
                    it.result = res
        except BaseException as exc:  # propagate to every waiter
            for it in batch:
                it.error = exc
        finally:
            with self._mu:
                self.num_batches += 1
                self.num_items += len(batch)
                self.max_seen_batch = max(self.max_seen_batch, len(batch))
            for it in batch:
                it.event.set()


def pad_bucket(n: int, cap: int) -> int:
    """Query-batch bucket before jit dispatch: next power of two >= n,
    clamped to cap. The scan's matmul is HBM-bound (Q-independent) but the
    top-k selection over (Q, N) scores scales with Q, so padding to the
    nearest bucket — not the full cap — keeps small batches cheap while
    bounding compiled graphs to log2(cap)+1 per (index, k-tier)."""
    m = 1
    while m < n and m < cap:
        m <<= 1
    return min(m, cap)


_K_TIERS = (10, 20, 50, 100, 200, 500, 1000)


def bucket_k(k: int) -> int:
    """Round a per-request top-k up to a fixed tier so arbitrary page
    sizes from the frontend don't each compile a fresh graph; callers
    slice the rows back to their own k (top-k results are prefix-stable
    in k)."""
    for t in _K_TIERS:
        if k <= t:
            return t
    return k
