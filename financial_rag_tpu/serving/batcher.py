"""Cross-request micro-batching for the serving hot path.

The TPU device is a batch machine: one 32-row encode or one 64-query index
sweep costs nearly the same as a 3-row one (the corpus stream / weight
traffic dominates). The reference serves each request in its own thread
with its own batch-1 device calls (reference api_server.py:857-882,
local_embedder.py:160-184); under concurrency that serializes N small
dispatches. Here concurrent requests transparently coalesce:

- :class:`MicroBatcher` — generic queue + worker that gathers submissions
  for up to ``max_wait_ms`` (or until ``max_items`` rows), runs ONE fused
  call, and scatters results back to the waiting request threads.
- :class:`BatchingEncoder` — wraps ``Encoder.encode``: concurrent text
  lists concatenate into one length-bucketed forward.
- :class:`BatchingIndex` — wraps ``index.search``: concurrent query
  matrices with the same (top_k, kwargs) concatenate into one sweep.

Enabled with SERVE_MICROBATCH=1 (config.serving.microbatch); a lone request
pays at most ``max_wait_ms`` extra latency, concurrent ones win back a full
device dispatch each. Mutating / persistence calls pass through unbatched.
"""

from __future__ import annotations

import threading
import time
from queue import Empty, Queue
from typing import Any, Callable, Dict, List, Sequence, Tuple

import numpy as np

from financial_rag_tpu.utils import get_logger

log = get_logger("serving.batcher")


class _Slot:
    __slots__ = ("event", "result", "error", "weight", "payload")

    def __init__(self, payload, weight: int) -> None:
        self.event = threading.Event()
        self.result = None
        self.error: Exception | None = None
        self.weight = weight
        self.payload = payload


class MicroBatcher:
    """Coalesce concurrent ``submit`` calls into batched ``fn`` calls.

    ``fn(payloads: list) -> list`` must return one result per payload, in
    order. ``weight`` (per submit) counts toward ``max_items`` — use the
    number of rows so the fused device call stays bounded.
    """

    def __init__(self, fn: Callable[[List[Any]], List[Any]], *,
                 max_items: int = 64, max_wait_ms: float = 2.0,
                 name: str = "batch") -> None:
        self.fn = fn
        self.max_items = max_items
        self.max_wait_s = max_wait_ms / 1000.0
        self.name = name
        self.calls = 0          # fused device calls issued
        self.submitted = 0      # requests coalesced into them
        self._q: Queue[_Slot] = Queue()
        self._closed = False
        self._worker = threading.Thread(
            target=self._loop, name=f"microbatch-{name}", daemon=True)
        self._worker.start()

    def submit(self, payload, weight: int = 1):
        if self._closed:
            raise RuntimeError(f"MicroBatcher {self.name} is closed")
        slot = _Slot(payload, max(weight, 1))
        self._q.put(slot)
        slot.event.wait()
        if slot.error is not None:
            raise slot.error
        return slot.result

    def close(self) -> None:
        self._closed = True
        self._q.put(None)  # wake the worker

    # ------------------------------------------------------------ worker

    def _loop(self) -> None:
        while True:
            first = self._q.get()
            if first is None:
                return
            batch = [first]
            weight = first.weight
            # Gather phase: ONE bounded sleep, then drain whatever queued.
            # A loop of timed q.get()s would re-arm the timeout per item and
            # inflate badly under GIL contention (each wake is scheduled
            # late when request threads hold the GIL); a single sleep bounds
            # the added latency to ~max_wait_s regardless of load.
            if weight < self.max_items and self._q.empty():
                time.sleep(self.max_wait_s)
            stop = False
            while weight < self.max_items:
                try:
                    nxt = self._q.get_nowait()
                except Empty:
                    break
                if nxt is None:
                    stop = True
                    break
                batch.append(nxt)
                weight += nxt.weight
            self._run(batch)
            if stop:
                return

    def _run(self, batch: List[_Slot]) -> None:
        self.calls += 1
        self.submitted += len(batch)
        try:
            results = self.fn([s.payload for s in batch])
            for slot, res in zip(batch, results):
                slot.result = res
        except Exception as e:  # noqa: BLE001 — propagate to every waiter
            log.exception("micro-batch %s failed (%d payloads)", self.name, len(batch))
            for slot in batch:
                slot.error = e
        finally:
            for slot in batch:
                slot.event.set()


class _Delegate:
    """Attribute passthrough so the wrapped object keeps its full API
    (upsert/delete/save/count/...). Dunders used by callers are forwarded
    explicitly — Python looks them up on the type, not the instance."""

    def __init__(self, inner) -> None:
        self.inner = inner

    def __getattr__(self, name):
        return getattr(self.inner, name)

    def __len__(self) -> int:
        return len(self.inner)


class BatchingEncoder(_Delegate):
    # block delegation of the raw dispatch-split API: callers must go
    # through the batching queue (see Encoder.supports_encode_begin)
    supports_encode_begin = False

    """Wraps an encoder's ``encode``: concurrent callers' text lists are
    concatenated into one length-bucketed forward pass."""

    def __init__(self, inner, *, max_texts: int = 128, max_wait_ms: float = 2.0,
                 name: str = "encode") -> None:
        super().__init__(inner)
        self.batcher = MicroBatcher(self._run, max_items=max_texts,
                                    max_wait_ms=max_wait_ms, name=name)

    def _run(self, groups: List[List[str]]) -> List[np.ndarray]:
        flat = [t for g in groups for t in g]
        vecs = self.inner.encode(flat)
        out, lo = [], 0
        for g in groups:
            out.append(vecs[lo: lo + len(g)])
            lo += len(g)
        return out

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        texts = list(texts)
        if not texts:
            return self.inner.encode(texts)
        return self.batcher.submit(texts, weight=len(texts))

    def encode_one(self, text: str) -> np.ndarray:
        return self.encode([text])[0]


class BatchingIndex(_Delegate):
    """Wraps an index's ``search``: concurrent query matrices with the same
    (top_k, kwargs) signature are stacked into one device sweep. One
    MicroBatcher per signature (shapes must agree for the fused call)."""

    def __init__(self, inner, *, max_queries: int = 64, max_wait_ms: float = 2.0,
                 name: str = "search") -> None:
        super().__init__(inner)
        self.max_queries = max_queries
        self.max_wait_ms = max_wait_ms
        self.name = name
        self._batchers: Dict[Tuple, MicroBatcher] = {}
        self._lock = threading.Lock()

    def _batcher_for(self, top_k: int, kwargs: dict) -> MicroBatcher:
        key = (top_k, tuple(sorted(kwargs.items())))
        mb = self._batchers.get(key)
        if mb is None:
            with self._lock:
                mb = self._batchers.get(key)
                if mb is None:
                    def run(groups: List[np.ndarray]) -> List[Tuple[np.ndarray, np.ndarray]]:
                        cat = np.concatenate(groups, axis=0)
                        # pad to a power-of-two row bucket: jit retraces per
                        # query-batch shape, and unpadded concatenations
                        # produce a fresh shape (= a fresh compile) for
                        # every distinct mix of coalesced requests
                        b = cat.shape[0]
                        bucket = 8
                        while bucket < b:
                            bucket *= 2
                        if bucket > b:
                            cat = np.pad(cat, ((0, bucket - b), (0, 0)))
                        ids, scores = self.inner.search(cat, top_k, **kwargs)
                        out, lo = [], 0
                        for g in groups:
                            out.append((ids[lo: lo + len(g)], scores[lo: lo + len(g)]))
                            lo += len(g)
                        return out

                    mb = MicroBatcher(run, max_items=self.max_queries,
                                      max_wait_ms=self.max_wait_ms,
                                      name=f"{self.name}@k{top_k}")
                    self._batchers[key] = mb
        return mb

    def search(self, queries: np.ndarray, top_k: int, **kwargs):
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        return self._batcher_for(top_k, kwargs).submit(q, weight=q.shape[0])

    def stats(self) -> dict:
        return {
            f"k{key[0]}": {"calls": mb.calls, "submitted": mb.submitted}
            for key, mb in self._batchers.items()
        }
