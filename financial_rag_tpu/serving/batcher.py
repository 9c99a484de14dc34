"""Cross-request micro-batching for the serving hot path.

The TPU device is a batch machine: one 32-row encode or one 64-query index
sweep costs nearly the same as a 3-row one (the corpus stream / weight
traffic dominates), and through a tunneled chip every host materialization
is a full RPC round trip (~27ms measured). The reference serves each
request in its own thread with its own batch-1 device calls (reference
api_server.py:857-882, local_embedder.py:160-184); under concurrency that
serializes N small dispatches. Here concurrent requests transparently
coalesce:

- :class:`MicroBatcher` — queue + dispatcher worker with CONTENTION-BASED
  batching: the first queued submission is taken immediately (no timed
  wait), together with everything else queued at that instant; submissions
  arriving while a fused call is in flight form the next batch. A lone
  request therefore pays only a thread handoff, and batch size adapts
  itself to load — the policy can never lose to thread-per-request by
  waiting (the round-2 regression: a 2ms timed gather sleep inflated p95
  4.3x under GIL contention).
- Pipelined dispatch: when the wrapped call supports a dispatch/
  materialize split (``search_begin`` / ``encode_begin``), the dispatcher
  issues the fused device call and hands materialization to a small
  finisher pool, then immediately gathers the next batch — several RPC
  round trips overlap in flight instead of serializing behind one worker
  loop (measured: concurrent device_gets do overlap; sequential ones do
  not).
- :class:`BatchingEncoder` / :class:`BatchingIndex` — wrappers exposing
  the same non-blocking ``encode_begin`` / ``search_begin`` surfaces as
  the raw objects, so the hybrid query path submits to ALL batchers
  before waiting on any.

ON by default (config.serving.microbatch; SERVE_MICROBATCH=0 disables —
the adaptive direct lane makes low-concurrency behavior identical to
thread-per-request). Mutating / persistence calls pass through unbatched.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Empty, Queue
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from financial_rag_tpu.utils import get_logger

log = get_logger("serving.batcher")


def split_by_groups(groups, take, size=len) -> List[Any]:
    """Unflatten a fused result back to per-submission pieces: for each
    group, call ``take(lo, hi)`` over its row range. ``size(g)`` gives a
    group's row count. The single place the slicing convention lives —
    fused results are ordered by submission with padding only at the end."""
    out, lo = [], 0
    for g in groups:
        n = size(g)
        out.append(take(lo, lo + n))
        lo += n
    return out


def _pad_to_bucket(cat: np.ndarray, bucket: int) -> np.ndarray:
    """Pad rows up to ONE fixed bucket (the batcher's max_queries), doubling
    only on overshoot. jit retraces per query-batch shape, and a fresh shape
    is a fresh compile — seconds through the tunnel. Variable power-of-two
    buckets (8/16/32/64) were measured as a p95 catastrophe (1.9s vs 262ms):
    every first-seen bucket size under load stalled a whole fused batch on a
    compile. One fixed shape means the warmup query compiles the exact
    kernel every later fused call reuses; the extra rows are nearly free —
    the sweep's cost is streaming the corpus from HBM, not query rows
    (ops/topk.py design note)."""
    b = cat.shape[0]
    while bucket < b:  # a gather can overshoot max_items by one submission
        bucket *= 2
    if bucket > b:
        cat = np.pad(cat, ((0, bucket - b), (0, 0)))
    return cat


class ActiveCount:
    """Shared concurrency gauge for the adaptive direct-lane policy. ALL of
    a runtime's batchers (per-model encode, fused sweep, rerank) share one
    instance, and the ENGINE brackets each request's lifetime with
    enter()/leave(): the tunnel's RPC call budget is one shared resource
    and a query crosses the phases in series, so the gate must compare
    CONCURRENT REQUESTS — gating each batcher on its own local submission
    count leaves every phase under the limit while the system as a whole
    burns 3-4 direct RPCs per query (measured: the real-checkpoint path
    stuck at ~70 QPS with 75% direct calls at 64 threads); counting
    submissions instead of requests double-counts the dual-encoder's
    begin-both pattern and flips 16-thread load into coalescing."""

    __slots__ = ("_n", "_lock")

    def __init__(self) -> None:
        self._n = 0
        self._lock = threading.Lock()

    def enter(self) -> int:
        with self._lock:
            self._n += 1
            return self._n

    def leave(self) -> None:
        with self._lock:
            self._n -= 1

    def value(self) -> int:
        return self._n


class _Slot:
    __slots__ = ("event", "result", "error", "weight", "payload", "on_done",
                 "claimed", "_claim_lock")

    def __init__(self, payload, weight: int, on_done=None) -> None:
        self.event = threading.Event()
        self.result = None
        self.error: Optional[Exception] = None
        self.weight = weight
        self.payload = payload
        self.on_done = on_done
        # ownership arbitration between the dispatcher (which pops slots to
        # run them) and the close/submit-side failure paths: only the party
        # that wins the claim may decide the slot's fate. Without it,
        # close() landing while a popped slot's fused call is in flight let
        # submit_begin overwrite slot.error and wake the waiter with
        # "closed" — dropping a healthy result.
        self.claimed = False
        self._claim_lock = threading.Lock()

    def claim(self) -> bool:
        """Dispatcher-side: take ownership of a popped slot. False if a
        failure path already finished it (drop it from the batch)."""
        with self._claim_lock:
            if self.event.is_set():
                return False
            self.claimed = True
            return True

    def fail_if_unclaimed(self, err: Exception) -> bool:
        """Failure-side: fail the slot unless the dispatcher owns it (its
        in-flight fused call will deliver the real result)."""
        with self._claim_lock:
            if self.claimed or self.event.is_set():
                return False
            self.error = err
            self.event.set()
            return True

    def wait(self):
        self.event.wait()
        if self.on_done is not None:
            self.on_done()
            self.on_done = None
        if self.error is not None:
            raise self.error
        return self.result


class _DirectSlot:
    """Adaptive-bypass slot: the fused call was already DISPATCHED in the
    submitting thread (no dispatcher handoff); ``wait`` materializes it in
    the calling thread. ``on_done`` decrements the active-request count."""

    __slots__ = ("_thunk", "_on_done", "_done", "result", "error")

    def __init__(self, thunk, on_done) -> None:
        self._thunk = thunk
        self._on_done = on_done
        self._done = False
        self.result = None
        self.error: Optional[Exception] = None

    def wait(self):
        if not self._done:
            try:
                self.result = self._thunk()[0]
            except Exception as e:  # noqa: BLE001 — propagate to the waiter
                self.error = e
            finally:
                self._done = True
                self._on_done()
        if self.error is not None:
            raise self.error
        return self.result


class MicroBatcher:
    """Coalesce concurrent ``submit`` calls into batched ``fn`` calls.

    ``fn(payloads: list) -> list`` must return one result per payload, in
    order. Alternatively ``fn_begin(payloads) -> thunk`` dispatches without
    materializing and the returned thunk produces the results — the
    pipelined path. ``weight`` (per submit) counts toward ``max_items`` —
    use the number of rows so the fused device call stays bounded.

    ``max_wait_ms`` is an OPTIONAL extra gather window (default 0 — pure
    contention-based batching; see module docstring for why waiting lost).
    """

    def __init__(self, fn: Optional[Callable[[List[Any]], List[Any]]] = None, *,
                 fn_begin: Optional[Callable[[List[Any]], Callable[[], List[Any]]]] = None,
                 max_items: int = 64, max_wait_ms: float = 0.0,
                 finishers: int = 8, inflight: Optional[int] = None,
                 direct: int = 0, active: Optional[ActiveCount] = None,
                 name: str = "batch") -> None:
        assert fn is not None or fn_begin is not None
        self.fn = fn
        self.fn_begin = fn_begin
        self.max_items = max_items
        self.max_wait_s = max_wait_ms / 1000.0
        self.name = name
        self.calls = 0          # fused device calls issued
        self.submitted = 0      # requests coalesced into them
        self._q: "Queue[Optional[_Slot]]" = Queue()
        self._closed = False
        self._pool = (ThreadPoolExecutor(max_workers=finishers,
                                         thread_name_prefix=f"mb-fin-{name}")
                      if fn_begin is not None else None)
        # bound the number of fused calls in flight so a dispatcher sprint
        # can't build an unbounded device queue. This is ALSO the batching
        # throttle: the worker acquires a slot BEFORE gathering, so a small
        # bound makes submissions pool into bigger fused batches while the
        # pipeline is full (fewer RPCs per query, each amortized further) —
        # the knob trades pipeline depth at low load for coalescing at high
        # load. Swept on the real chip (scripts/profile_serving.py).
        if inflight is None:
            inflight = max(finishers, 1) * 2
        self._inflight = threading.Semaphore(max(inflight, 1))
        # ADAPTIVE BYPASS (the "never a regression" policy): while the
        # number of ACTIVE requests (submitted, not yet waited out) is at
        # most `direct`, a submission runs direct — the fused call
        # dispatches in the submitting thread and materializes at wait(),
        # exactly thread-per-request semantics with zero handoff latency.
        # Above that concurrency, everything pools into coalesced batches:
        # a direct call spends a whole tunnel RPC slot on ONE request,
        # while a coalesced call carries ~20; letting direct calls keep
        # firing under load steals the tunnel's call budget (measured:
        # queue-emptiness gating left 64-thread load 64% direct and QPS at
        # 290; concurrency gating coalesces the same load fully). At or
        # below `direct` concurrency the policy IS thread-per-request, so
        # it cannot regress against it.
        self.direct_calls = 0
        self.direct_limit = direct if fn_begin is not None else 0
        # shared gauge: the engine brackets request lifetimes, the batcher
        # only READS it. Private fallback (standalone batchers, tests):
        # count this batcher's own in-flight submissions.
        self._active = active if active is not None else ActiveCount()
        self._owns_gauge = active is None
        self._worker = threading.Thread(
            target=self._loop, name=f"microbatch-{name}", daemon=True)
        self._worker.start()

    # ------------------------------------------------------------- submit

    def submit_begin(self, payload, weight: int = 1):
        """Enqueue without waiting; ``slot.wait()`` blocks for the result.
        Lets a caller feed several batchers before waiting on any."""
        if self._closed:
            raise RuntimeError(f"MicroBatcher {self.name} is closed")
        if self._owns_gauge:
            count = self._active.enter()
            on_done = self._leave
        else:
            count = self._active.value()
            on_done = None
        # direct_limit == 0 means NO direct lane (pure coalescing, or a
        # plain-fn batcher with no begin split) — the shared gauge reads 0
        # when idle, so the comparison alone would mis-route there
        go_direct = 0 < self.direct_limit and count <= self.direct_limit
        if go_direct:
            try:
                thunk = self.fn_begin([payload])
            except Exception:
                if on_done is not None:
                    on_done()
                raise
            self.direct_calls += 1
            return _DirectSlot(thunk, on_done or (lambda: None))
        slot = _Slot(payload, max(weight, 1), on_done=on_done)
        self._q.put(slot)
        if self._closed:
            # submit raced close(): the worker and the close() drain may
            # BOTH already be done, leaving this slot unserviced forever —
            # fail it here. fail_if_unclaimed leaves the slot alone if the
            # dispatcher already popped and claimed it (its in-flight fused
            # call delivers the real result; failing here would drop it).
            slot.fail_if_unclaimed(
                RuntimeError(f"MicroBatcher {self.name} is closed"))
        return slot

    def _leave(self) -> None:
        self._active.leave()

    def direct_now(self) -> bool:
        """True while the adaptive policy would run a submission direct
        (the submit_begin gate, read without entering the gauge); lets a
        wrapper route around the queue entirely — e.g. the device-out
        encode that must reach the INNER encoder (BatchingEncoder
        .encode_begin_device)."""
        return 0 < self.direct_limit and self._active.value() <= self.direct_limit

    def submit(self, payload, weight: int = 1):
        return self.submit_begin(payload, weight).wait()

    def close(self) -> None:
        self._closed = True
        self._q.put(None)  # wake the worker
        self._worker.join(timeout=5.0)
        # drain anything the worker didn't get to (including slots that
        # raced the _closed check) so no submitter blocks forever
        err = RuntimeError(f"MicroBatcher {self.name} is closed")
        while True:
            try:
                slot = self._q.get_nowait()
            except Empty:
                break
            if slot is not None:
                slot.fail_if_unclaimed(err)
        if self._pool is not None:
            self._pool.shutdown(wait=True)

    # ------------------------------------------------------------ worker

    def _loop(self) -> None:
        carry: Optional[_Slot] = None
        while True:
            first = carry if carry is not None else self._q.get()
            carry = None
            if first is None:
                return
            if not first.claim():  # a failure path finished it already
                continue
            if self.fn_begin is not None:
                # claim the in-flight slot BEFORE gathering: while all
                # finisher slots are busy nothing can dispatch anyway, so
                # blocking here lets the queue build and the next fused call
                # carry everything that accumulated — batch size adapts to
                # backpressure with zero added latency (measured: gathering
                # first produced avg batches of 2.9 under 16 threads; this
                # ordering produces near-concurrency-sized batches)
                self._inflight.acquire()
            batch = [first]
            weight = first.weight
            if self.max_wait_s > 0 and weight < self.max_items and self._q.empty():
                threading.Event().wait(self.max_wait_s)  # optional gather window
            stop = False
            while weight < self.max_items:
                try:
                    nxt = self._q.get_nowait()
                except Empty:
                    break
                if nxt is None:
                    stop = True
                    break
                if not nxt.claim():  # a failure path finished it already
                    continue
                if weight + nxt.weight > self.max_items:
                    # never overshoot the batch's ONE static padded shape —
                    # the overflow submission seeds the next batch
                    carry = nxt
                    break
                batch.append(nxt)
                weight += nxt.weight
            self._run(batch)
            if stop:
                return

    def _run(self, batch: List[_Slot]) -> None:
        self.calls += 1
        self.submitted += len(batch)
        payloads = [s.payload for s in batch]
        if self.fn_begin is None:
            self._finish(batch, lambda: self.fn(payloads))
            return
        # in-flight slot already held (acquired in _loop before gathering)
        try:
            thunk = self.fn_begin(payloads)
        except Exception as e:  # noqa: BLE001 — propagate to every waiter
            self._inflight.release()
            self._fail(batch, e)
            return
        try:
            self._pool.submit(self._finish, batch, thunk, release=True)
        except RuntimeError:
            # close() shut the pool after its join timed out while this
            # worker was blocked on the in-flight semaphore: finish inline
            # so the batch's waiters are never stranded
            self._finish(batch, thunk, release=True)

    def _finish(self, batch: List[_Slot], thunk, release: bool = False) -> None:
        try:
            results = thunk()
            for slot, res in zip(batch, results):
                slot.result = res
        except Exception as e:  # noqa: BLE001 — propagate to every waiter
            log.exception("micro-batch %s failed (%d payloads)", self.name, len(batch))
            for slot in batch:
                slot.error = e
        finally:
            if release:
                self._inflight.release()
            for slot in batch:
                slot.event.set()

    def _fail(self, batch: List[_Slot], e: Exception) -> None:
        log.exception("micro-batch %s dispatch failed (%d payloads)",
                      self.name, len(batch))
        for slot in batch:
            slot.error = e
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
    """Wraps an encoder: concurrent callers' text lists are concatenated
    into one length-bucketed forward pass. Exposes its own queue-backed
    ``encode_begin`` (the class flag opts in) so DualEncoder.encode_all
    submits BOTH models' texts before waiting on either."""

    supports_encode_begin = True

    def __init__(self, inner, *, max_texts: int = 128, max_wait_ms: float = 0.0,
                 direct: int = 0, active: Optional[ActiveCount] = None,
                 name: str = "encode") -> None:
        super().__init__(inner)
        split = getattr(type(inner), "supports_encode_begin", False)
        self.batcher = MicroBatcher(
            fn=None if split else self._run,
            fn_begin=self._run_begin if split else None,
            max_items=max_texts, max_wait_ms=max_wait_ms,
            direct=direct, active=active, name=name)

    def _flatten(self, groups: List[List[str]]):
        return [t for g in groups for t in g]

    def _split(self, groups: List[List[str]], vecs: np.ndarray) -> List[np.ndarray]:
        return split_by_groups(groups, lambda lo, hi: vecs[lo:hi])

    def _run(self, groups: List[List[str]]) -> List[np.ndarray]:
        return self._split(groups, self.inner.encode(self._flatten(groups)))

    def _run_begin(self, groups: List[List[str]]):
        materialize = self.inner.encode_begin(self._flatten(groups))
        return lambda: self._split(groups, materialize())

    def encode_begin(self, texts: Sequence[str]):
        texts = list(texts)
        if not texts:
            return lambda: self.inner.encode(texts)
        slot = self.batcher.submit_begin(texts, weight=len(texts))
        return slot.wait

    # device-out passthrough: coalescing requires the fused result split
    # host-side, so a QUEUED submission can only yield host arrays — but at
    # or below the direct concurrency limit the adaptive policy runs the
    # call in the submitting thread anyway, and there the inner encoder's
    # device materializer can be handed out untouched (feeds the chained
    # encode->sweep raw lane, retrieval/hybrid.py). Above the limit this
    # falls back to the queued host path; callers handle both
    # (DualEncoder.encode_all_begin contract).
    supports_device_out = True

    def encode_begin_device(self, texts: Sequence[str], *, seqs=None):
        inner = self.inner
        if (getattr(type(inner), "supports_device_out", False)
                and self.batcher.direct_now()):
            self.batcher.direct_calls += 1
            return inner.encode_begin_device(texts, seqs=seqs)
        return self.encode_begin(texts)

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        return self.encode_begin(texts)()

    def encode_one(self, text: str) -> np.ndarray:
        return self.encode([text])[0]


class BatchingCrossEncoder(_Delegate):
    """Wraps a CrossEncoderModel: concurrent requests' (query, text) pair
    lists concatenate into ONE forward (the rerank pass was the last
    unbatched per-request RPC on the real-checkpoint serving path —
    VERDICT r2 #5 regime). Same adaptive direct-lane policy as the sweep
    batcher: at low concurrency a request dispatches its own forward."""

    def __init__(self, inner, *, max_pairs: int = 256, max_wait_ms: float = 0.0,
                 direct: int = 0, active: Optional[ActiveCount] = None,
                 name: str = "rerank") -> None:
        super().__init__(inner)
        self.batcher = MicroBatcher(
            fn_begin=self._run_begin, max_items=max_pairs,
            max_wait_ms=max_wait_ms, direct=direct, active=active, name=name)

    def _run_begin(self, groups: List[List]):
        flat = [p for g in groups for p in g]
        # coalesced batches pin ONE static row shape (max_items); a
        # single-group call (direct lane / lone submission) keeps its
        # natural small bucket — exactly two compiled shapes, both warmed
        # by Runtime._warm_rerank
        pad = self.batcher.max_items if len(groups) > 1 else None
        materialize = self.inner.predict_begin(flat, pad_pairs=pad)

        def thunk():
            scores = materialize()
            return split_by_groups(groups, lambda lo, hi: scores[lo:hi])

        return thunk

    def predict_begin(self, pairs):
        pairs = list(pairs)
        if not pairs:
            return lambda: self.inner.predict(pairs)
        slot = self.batcher.submit_begin(pairs, weight=len(pairs))
        return slot.wait

    def predict(self, pairs) -> np.ndarray:
        return self.predict_begin(pairs)()

    def stats(self) -> dict:
        return {"calls": self.batcher.calls, "submitted": self.batcher.submitted,
                "direct": self.batcher.direct_calls}


class MultiIndexBatcher:
    """Coalesce concurrent requests' PER-MODEL index sweeps into one fused
    device round trip.

    A hybrid query sweeps every per-model index (baai + gte). Wrapping each
    index in its own :class:`BatchingIndex` still costs one RPC per model
    per fused batch, and each request thread blocks on two batcher slots.
    Here a submission is the whole ``{model: [B, D]}`` dict; the fused call
    concatenates rows per model, dispatches ALL indexes' sweeps
    back-to-back, and materializes them with a single combined device_get
    (index/pending.collect) — one RPC round trip per fused batch, total.

    Submissions must cover the same model set (the hybrid path always
    does); B may differ per request but is equal across models within one
    request (the same query variants encoded per model).
    """

    # rows bucket for the direct lane (a single request's 1-3 query
    # variants); everything larger pads to max_queries. EXACTLY two static
    # shapes, both precompiled by warmup() — round 2 measured variable
    # power-of-two buckets as a p95 catastrophe (each first-seen shape
    # under load stalled a fused batch on a fresh compile)
    DIRECT_BUCKET = 8

    def __init__(self, indexes: Dict[str, Any], *, max_queries: int = 64,
                 max_wait_ms: float = 0.0, inflight: Optional[int] = None,
                 direct: int = 0, active: Optional[ActiveCount] = None,
                 name: str = "sweep", chain_encoder=None) -> None:
        self.indexes = indexes
        self.max_queries = max_queries
        self.max_wait_ms = max_wait_ms
        self.inflight = inflight
        self.direct = direct
        self.active = active
        self.name = name
        # RAW DualEncoder (unwrapped members sharing the serving embedding
        # cache) for the device-chained wave lane (search_texts): the wave
        # encodes texts itself, so going through the BatchingEncoder queue
        # here would nest one batcher inside another and serialize waves
        # behind the encode batcher's RPC
        self.chain_encoder = chain_encoder
        self._chain_ok: Optional[bool] = None
        self._batchers: Dict[int, MicroBatcher] = {}
        self._chained: Dict[int, MicroBatcher] = {}
        self._lock = threading.Lock()

    def _pad_rows(self, cat: np.ndarray) -> np.ndarray:
        if cat.shape[0] <= self.DIRECT_BUCKET:
            return _pad_to_bucket(cat, self.DIRECT_BUCKET)
        return _pad_to_bucket(cat, self.max_queries)

    def warmup(self, top_k: int) -> None:
        """Compile both static sweep shapes (DIRECT_BUCKET and max_queries
        rows) against the current index storage so no fused call under load
        ever stalls on a compile. Call after (re)ingest — storage capacity
        is part of the compiled shape."""
        dims = {idx.dim for idx in self.indexes.values()}
        assert len(dims) == 1, dims
        dim = dims.pop()
        mb = self._batcher_for(top_k)
        for rows in (1, self.max_queries):
            thunk = mb.fn_begin([{name: np.zeros((rows, dim), np.float32)
                                  for name in self.indexes}])
            thunk()
        if self.supports_chained_waves():
            # compile the pinned-shape chained programs for the two common
            # query sequence buckets (64 and 128 tokens): encode forward +
            # on-device gather + sweep, per model. Rarer buckets (256/512)
            # compile on first sight and persist in the compilation cache.
            for text in ("what is the total amount due",
                         "what is the total amount due " * 16):
                self._chained_begin([[text]], top_k)()

    def _batcher_for(self, top_k: int) -> MicroBatcher:
        mb = self._batchers.get(top_k)
        if mb is None:
            with self._lock:
                mb = self._batchers.get(top_k)
                if mb is None:
                    def begin(groups: List[Dict[str, np.ndarray]]):
                        from financial_rag_tpu.index.pending import collect, ready

                        names = list(self.indexes.keys())
                        pendings = []
                        for mname in names:
                            idx = self.indexes[mname]
                            cat = self._pad_rows(np.concatenate(
                                [np.asarray(g[mname], np.float32) for g in groups]))
                            if getattr(type(idx), "supports_search_begin", False):
                                pendings.append(idx.search_begin(cat, top_k))
                            else:
                                pendings.append(ready(*idx.search(cat, top_k)))

                        def thunk():
                            per_model = dict(zip(names, collect(pendings)))  # ONE RPC
                            return split_by_groups(
                                groups,
                                lambda lo, hi: {m: (ids[lo:hi], sc[lo:hi])
                                                for m, (ids, sc) in per_model.items()},
                                size=lambda g: len(next(iter(g.values()))))

                        return thunk

                    mb = MicroBatcher(fn_begin=begin, max_items=self.max_queries,
                                      max_wait_ms=self.max_wait_ms,
                                      inflight=self.inflight, direct=self.direct,
                                      active=self.active,
                                      name=f"{self.name}@k{top_k}")
                    self._batchers[top_k] = mb
        return mb

    # ---------------------------------------------------- chained wave lane

    def supports_chained_waves(self) -> bool:
        """True when a coalesced wave can run the WHOLE dense query path —
        tokenize -> per-model encode -> per-model index sweep — as one
        device-chained program with a single combined device_get (VERDICT
        r3 #2: the two-phase waves materialized the fused encode on host
        before submitting the fused sweep, ~3 RPCs per wave). Requires raw
        device-out encoders sharing one tokenizer and indexes that accept
        jax.Array queries."""
        if self._chain_ok is None:
            de = self.chain_encoder
            self._chain_ok = bool(
                de is not None
                and all(getattr(type(i), "accepts_device_queries", False)
                        for i in self.indexes.values())
                and all(getattr(type(e), "supports_device_out", False)
                        for e in de.encoders.values())
                and de._shared_tokenizer() is not None)
        return self._chain_ok

    def search_texts(self, queries: List[str], top_k: int
                     ) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
        """Blocking chained wave: coalesces concurrent requests' QUERY TEXTS
        (not vectors) and returns ``{model: (ids [B,k], scores [B,k])}`` per
        request. Requires supports_chained_waves()."""
        b = len(queries)
        return self._chained_for(top_k).submit(list(queries), weight=b)

    def _wave_seq_bucket(self, lens) -> int:
        """One sequence bucket for the whole wave (the pinned-shape
        contract of Encoder.encode_begin_device): smallest encoder bucket
        covering the wave's longest text, so the compiled shape set stays
        {rows} x {64, 128, ...} — warmable, never truncating."""
        from financial_rag_tpu.models.encoder import SEQ_BUCKETS

        longest = int(max(lens)) if len(lens) else 1
        for b in SEQ_BUCKETS:
            if longest <= b:
                return b
        return SEQ_BUCKETS[-1]

    def _chained_begin(self, groups: List[List[str]], top_k: int):
        """Dispatch one fused wave: pad texts to the static row bucket,
        tokenize once, pin-shape encode per model (device-out), feed the
        device embeddings straight into every index's sweep, and return a
        thunk that materializes sweep results AND the query vectors (cache
        fill) in ONE combined device_get."""
        from financial_rag_tpu.index.pending import collect

        de = self.chain_encoder
        texts = [t for g in groups for t in g]
        bucket = self.max_queries
        while bucket < len(texts):   # a gather can overshoot by one submission
            bucket *= 2
        padded = texts + [""] * (bucket - len(texts))
        tok, max_len = de._shared_tokenizer()
        seqs = tok.encode_many_packed(padded, max_len=max_len)
        seq_pin = self._wave_seq_bucket(seqs[1])

        names = list(self.indexes.keys())
        dev = {name: de.encoders[name].encode_begin_device(
                   padded, seqs=seqs, seq_bucket=seq_pin, rows_bucket=bucket)()
               for name in names}
        pendings = [self.indexes[name].search_begin(dev[name], top_k)
                    for name in names]

        def thunk():
            if de.cache is not None:
                results, vec_host = collect(pendings,
                                            extra=[dev[n] for n in names])
                for name, hv in zip(names, vec_host):
                    arr = np.asarray(hv, np.float32)
                    for i, t in enumerate(texts):   # filler rows skipped
                        de.cache.put(name, t, arr[i])
            else:
                results = collect(pendings)
            per_model = dict(zip(names, results))
            return split_by_groups(
                groups,
                lambda lo, hi: {m: (ids[lo:hi], sc[lo:hi])
                                for m, (ids, sc) in per_model.items()})

        return thunk

    def _chained_for(self, top_k: int) -> MicroBatcher:
        mb = self._chained.get(top_k)
        if mb is None:
            with self._lock:
                mb = self._chained.get(top_k)
                if mb is None:
                    mb = MicroBatcher(
                        fn_begin=lambda groups: self._chained_begin(groups, top_k),
                        max_items=self.max_queries,
                        max_wait_ms=self.max_wait_ms, inflight=self.inflight,
                        name=f"{self.name}-chained@k{top_k}")
                    self._chained[top_k] = mb
        return mb

    def bypass(self) -> bool:
        """True while system concurrency is at or below the direct limit:
        the caller should take its RAW per-request path — the literal
        thread-per-request code, zero wrapper overhead — instead of
        submitting here. (The MicroBatcher's own direct lane still pays a
        group wrap, a pad to DIRECT_BUCKET rows and slot plumbing —
        measured ~3% at 16 threads; the bypass makes low-load behavior
        IDENTICAL by construction.)"""
        return (self.direct > 0 and self.active is not None
                and self.active.value() <= self.direct)

    def search_all(self, per_model_vecs: Dict[str, np.ndarray],
                   top_k: int) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
        """Blocking fused sweep of every index; returns
        ``{model: (ids [B,k], scores [B,k])}``."""
        b = len(next(iter(per_model_vecs.values())))
        return self._batcher_for(top_k).submit(per_model_vecs, weight=b)

    def stats(self) -> dict:
        out = {
            f"k{k}": {"calls": mb.calls, "submitted": mb.submitted,
                      "direct": mb.direct_calls}
            for k, mb in self._batchers.items()
        }
        for k, mb in self._chained.items():
            out[f"chained@k{k}"] = {"calls": mb.calls, "submitted": mb.submitted}
        return out


class BatchingIndex(_Delegate):
    """Wraps an index's ``search``: concurrent query matrices with the same
    (top_k, kwargs) signature are stacked into one device sweep. One
    MicroBatcher per signature (shapes must agree for the fused call).
    Exposes a queue-backed ``search_begin`` so the hybrid path submits to
    every per-model index before waiting on any."""

    supports_search_begin = True

    def __init__(self, inner, *, max_queries: int = 64, max_wait_ms: float = 0.0,
                 name: str = "search") -> None:
        super().__init__(inner)
        self.max_queries = max_queries
        self.max_wait_ms = max_wait_ms
        self.name = name
        self._batchers: Dict[Tuple, MicroBatcher] = {}
        self._lock = threading.Lock()

    def _fused(self, groups: List[np.ndarray], top_k: int, kwargs: dict):
        return _pad_to_bucket(np.concatenate(groups, axis=0), self.max_queries)

    def _split(self, groups, ids, scores):
        return split_by_groups(groups, lambda lo, hi: (ids[lo:hi], scores[lo:hi]))

    def _batcher_for(self, top_k: int, kwargs: dict) -> MicroBatcher:
        key = (top_k, tuple(sorted(kwargs.items())))
        mb = self._batchers.get(key)
        if mb is None:
            with self._lock:
                mb = self._batchers.get(key)
                if mb is None:
                    split = getattr(type(self.inner), "supports_search_begin", False)

                    def run(groups: List[np.ndarray]):
                        cat = self._fused(groups, top_k, kwargs)
                        ids, scores = self.inner.search(cat, top_k, **kwargs)
                        return self._split(groups, ids, scores)

                    def run_begin(groups: List[np.ndarray]):
                        cat = self._fused(groups, top_k, kwargs)
                        pending = self.inner.search_begin(cat, top_k, **kwargs)
                        return lambda: self._split(groups, *pending.get())

                    mb = MicroBatcher(fn=None if split else run,
                                      fn_begin=run_begin if split else None,
                                      max_items=self.max_queries,
                                      max_wait_ms=self.max_wait_ms,
                                      name=f"{self.name}@k{top_k}")
                    self._batchers[key] = mb
        return mb

    def search_begin(self, queries: np.ndarray, top_k: int, **kwargs):
        from financial_rag_tpu.index.pending import SearchPending

        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        slot = self._batcher_for(top_k, kwargs).submit_begin(q, weight=q.shape[0])
        return SearchPending(None, lambda _: slot.wait())

    def search(self, queries: np.ndarray, top_k: int, **kwargs):
        return self.search_begin(queries, top_k, **kwargs).get()

    def stats(self) -> dict:
        return {
            f"k{key[0]}": {"calls": mb.calls, "submitted": mb.submitted}
            for key, mb in self._batchers.items()
        }


class BatchingLLM(_Delegate):
    """Wraps a LocalLLM: concurrent requests' answer generations coalesce
    into ONE batched decode (LocalLLM.generate_many). A decode step costs
    ~3.0 ms for eight rows vs ~1.8 ms for one at the 0.5B shape
    (BENCH_LLM.json) — the weights stream from HBM once per step no matter
    the batch — so under load this nearly 5x-es answer throughput. Same
    adaptive direct-lane policy as the other batchers. generate_stream
    routes the same way: at or below `direct` concurrency a stream takes
    the inner provider's own per-request stream (LocalLLM's speculative
    batch-1 path); above it, streams JOIN the shared continuous-batching
    decode (llm/continuous.py), falling back to the per-request stream
    whenever the engine declines or the window races away before the
    first token."""

    def __init__(self, inner, *, max_items: int = 8, max_wait_ms: float = 0.0,
                 direct: int = 0, active: Optional[ActiveCount] = None,
                 name: str = "llm") -> None:
        super().__init__(inner)
        self.batcher = MicroBatcher(fn=self._run, max_items=max_items,
                                    max_wait_ms=max_wait_ms, name=name)
        # the direct lane lives HERE, not in the MicroBatcher (whose lane
        # rides the fn_begin split — generation is one blocking device call
        # with no begin/finish phases): at or below `direct` concurrency a
        # request runs the INNER provider's own generate, i.e. LocalLLM's
        # speculative batch-1 path (0.85 ms/token, BENCH_LLM.json) rather
        # than the batched plain-greedy decode (1.8 ms/token at batch 1)
        self._direct = max(0, int(direct))
        self._active = active if active is not None else ActiveCount()
        self._owns_gauge = active is None
        self.direct_calls = 0
        self.engine_streams = 0

    def __bool__(self) -> bool:
        # callers do `llm or NullLLM()`; without this Python falls through
        # to _Delegate.__len__, which a provider doesn't have
        return True

    def _run(self, payloads: List[Any]) -> List[Any]:
        prompts = [p for p, _ in payloads]
        # one wave decodes to the LARGEST member's bucket, but each row is
        # trimmed to its OWN cap — coalescing must not relax any single
        # request's max_tokens contract
        caps = [mt for _, mt in payloads]
        return self.inner.generate_many(prompts, max_tokens=caps)

    def generate(self, prompt: str, *, max_tokens: int = 1024):
        if not self.inner.available():
            return None
        count = (self._active.enter() if self._owns_gauge
                 else self._active.value())
        try:
            if 0 < self._direct and count <= self._direct:
                self.direct_calls += 1
                return self.inner.generate(prompt, max_tokens=max_tokens)
            return self.batcher.submit((prompt, max_tokens))
        finally:
            if self._owns_gauge:
                self._active.leave()

    def generate_stream(self, prompt: str, *, max_tokens: int = 1024,
                        **kwargs):
        """Streaming with the same adaptive policy as generate(): at or
        below `direct` concurrency the request takes the inner provider's
        own per-request stream (LocalLLM's speculative batch-1 path);
        above it, concurrent streams JOIN the shared continuous-batching
        decode (llm/continuous.py) so the per-step weight stream amortizes
        across them. Falls back to the per-request stream whenever the
        engine declines (disabled, window exhausted, oversize request) —
        routing here never degrades a request."""
        if self._owns_gauge:
            # bracket the stream's whole lifetime so concurrent streams
            # see each other's load (mirrors generate())
            self._active.enter()
        try:
            count = self._active.value()
            if self._direct and count > self._direct:
                via = getattr(self.inner, "stream_via_engine", None)
                gen = via(prompt, max_tokens=max_tokens) if via else None
                if gen is not None:
                    from financial_rag_tpu.llm.continuous import (
                        WindowRacedError)
                    self.engine_streams += 1
                    emitted = False
                    try:
                        for delta in gen:
                            emitted = True
                            yield delta
                        return
                    except WindowRacedError:
                        if emitted:   # can't happen (raced pre-first-token),
                            raise     # but never retract sent deltas
                        # zero deltas out: clean per-request fallback
            yield from self.inner.generate_stream(
                prompt, max_tokens=max_tokens, **kwargs)
        finally:
            if self._owns_gauge:
                self._active.leave()

    def stats(self) -> dict:
        return {"calls": self.batcher.calls,
                "submitted": self.batcher.submitted,
                "direct": self.direct_calls,
                "engine_streams": self.engine_streams}
