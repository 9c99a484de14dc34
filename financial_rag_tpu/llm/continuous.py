"""Continuous batching for streaming answer synthesis.

The reference serves one external-LLM HTTP call per request (reference
api_adapter.py:18-56) — concurrency is the remote provider's problem. Here
the decoder runs on the serving chip, and a decode step's cost is the
weight stream from HBM regardless of batch size (~3.0 ms for eight rows vs
~1.8 ms for one at the 0.5B shape, BENCH_LLM.json). Per-request streams
serialize that cost; `BatchingLLM.generate_many` amortizes it but only for
one-shot waves that arrive together. This module amortizes it for LIVE
STREAMS with staggered arrivals: concurrent `/search-stream` answers share
ONE batched decode loop, and new requests JOIN at segment boundaries
instead of waiting for the current generation to finish (the vLLM-style
continuous-batching idea, built TPU-first).

TPU-first design — everything static-shaped, one compiled program each:
- The engine owns a fixed [rows] slot batch and a shared KV cache
  [L, rows, T, KV, D] laid out in SHARED WRITE-HEAD coordinates: every
  decode step writes every row's k/v at the same slot `w` (the global step
  counter), exactly like `_decode_one`'s uniform-slot layout, so the
  segment step is ONE `lax.scan` with no per-row scatter (a per-row write
  head would lower to scatters that rewrite the cache every step).
- A joiner's prompt k/v is PREFILLED separately at its own bucket and
  spliced as one `dynamic_update_slice` at [w - s, w) of its row — right
  behind the write head, so a row's live region (prompt + its decode
  tokens) is always contiguous and no gap masking is needed. Dead data
  from the row's previous occupant is hidden by the per-row prompt mask,
  which `_decode_one` already consults.
- Per-row rotary positions ride in the carry ([rows] vector — left padding
  and join time never shift a row's rotation); the shared write head stays
  host-tracked (it advances deterministically, one slot per step).
- Admission control instead of cache defragmentation: the shared window
  spends one slot per step, so a request with cap `c` is admitted only
  when `c` slots remain; when the engine drains empty the write head
  resets for free (masks hide the stale cache). Rejected submissions
  return None and the caller falls back to the per-request stream — the
  same never-a-regression contract as serving/batcher.py.

Greedy semantics (serving answers are greedy): a joined stream's token
sequence equals batch-1 greedy `generate_tokens` output trimmed at eos —
exactly in f32 (pinned by tests/test_continuous.py); under bf16 a near-tie
can resolve differently across batch shapes, the same property as
`generate_many` waves.

Speculative blocks (spec_k > 0, the default): instead of one token per
dispatch per row, each dispatch drafts spec_k tokens per row by
prompt-lookup against the row's OWN fed history, verifies every row's
block in ONE `_verify_block_rows` pass (the per-step weight stream
amortizes across rows AND block positions), and emits each row's
prefix-correct span — 1..spec_k+1 tokens per row at one dispatch's cost.
The shared write head is preserved: the head advances by the full block
width every dispatch and each row's rejected slots are masked out of its
prompt mask instead of rewound. Window slots burn at blk/dispatch, so the
host falls back to greedy segments whenever one more spec block could
strand a live row (_spec_admissible), which also keeps the admission
invariant (cap slots guarantee completion) intact. Acceptance only affects
speed, never the token sequence — the verify pass recomputes every token.
"""

from __future__ import annotations

import queue
import threading
from functools import partial
from typing import Any, Dict, List, Optional

import numpy as np

from financial_rag_tpu.utils import get_logger

log = get_logger("llm.continuous")

_CLOSED = object()          # stream sentinel: engine shut down mid-request
_REJECTED = object()        # stream sentinel: window raced away post-submit


class WindowRacedError(RuntimeError):
    """Raised by a stream iterator when the shared window raced away
    between submit()'s admission check and the worker's join. Guaranteed
    to fire BEFORE any token block is yielded, so callers may cleanly
    fall back to a per-request stream (serving/batcher.py does)."""


# ------------------------------------------------------------ device side

def _jit_prefill_row(cfg, prefill_impl: str):
    import jax
    import jax.numpy as jnp

    from financial_rag_tpu.models.decoder import _prefill

    @jax.jit
    def prefill_row(params, input_ids, attention_mask):
        # max_total == s: the returned caches are exactly the prompt's k/v
        # [L, 1, s, KV, D] — the join splices them behind the write head
        last_logits, k_seq, v_seq = _prefill(
            params, input_ids, attention_mask, input_ids.shape[1], cfg,
            prefill_impl)
        tok0 = jnp.argmax(last_logits[0]).astype(jnp.int32)
        return tok0, k_seq, v_seq

    return prefill_row


def _jit_join(cfg):
    import jax

    @partial(jax.jit, donate_argnums=(0,))
    def join(state, row, k_seq, v_seq, off, tok0, pos0, pm_row, ids, vfrom):
        """Install a prefilled request into slot `row` at cache [off, off+s).

        state is donated: the [L, rows, T, KV, D] caches update in place.
        pm_row [T] bool comes precomputed from the host (it knows the write
        head): prompt padding False, prompt tokens True, every slot from
        the write head on True (the row writes them each step from now on),
        everything before the prompt False (the previous occupant's data).
        ids [1, s] (the padded prompt) splices into the row's ctx buffer at
        the same [off, off+s) slots so prompt-lookup drafting can match
        against the prompt; vfrom is the first REAL (non-padding) slot.
        """
        kc = jax.lax.dynamic_update_slice(
            state["kc"], k_seq, (0, row, off, 0, 0))
        vc = jax.lax.dynamic_update_slice(
            state["vc"], v_seq, (0, row, off, 0, 0))
        ctx_row = jax.lax.dynamic_update_slice(
            state["ctx"][row][None, :], ids, (0, off))[0]
        return {
            "kc": kc, "vc": vc,
            "tok": state["tok"].at[row].set(tok0),
            "pos": state["pos"].at[row].set(pos0),
            "done": state["done"].at[row].set(tok0 == cfg.eos_token_id),
            "pm": state["pm"].at[row].set(pm_row),
            "ctx": state["ctx"].at[row].set(ctx_row),
            "vfrom": state["vfrom"].at[row].set(vfrom),
        }

    return join


def _jit_segment(cfg, segment: int):
    import jax
    import jax.numpy as jnp

    from financial_rag_tpu.models.decoder import _decode_one

    @partial(jax.jit, donate_argnums=(1,))
    def seg(params, state, w0):
        """`segment` decode steps for every row; ONE dispatch.

        w0: scalar int32, the shared write head at segment start. Returns
        (tokens [rows, segment], new_state). Rows whose stream already
        finished keep feeding eos into their own row — junk that only they
        attend to, and whose outputs the host discards. Fed tokens are
        recorded in the per-row ctx buffer so later SPECULATIVE blocks can
        prompt-lookup against everything generated so far.
        """
        pm = state["pm"]

        def step(carry, i):
            tok, pos, done, kc, vc, ctx = carry
            ctx = jax.lax.dynamic_update_slice(ctx, tok[:, None], (0, w0 + i))
            logits, kc, vc = _decode_one(params, tok, pos, w0 + i, kc, vc,
                                         pm, cfg)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, cfg.eos_token_id, nxt)
            done = done | (nxt == cfg.eos_token_id)
            return (nxt, pos + 1, done, kc, vc, ctx), nxt

        (tok, pos, done, kc, vc, ctx), ys = jax.lax.scan(
            step, (state["tok"], state["pos"], state["done"],
                   state["kc"], state["vc"], state["ctx"]),
            jnp.arange(segment, dtype=jnp.int32))
        new_state = {"kc": kc, "vc": vc, "tok": tok, "pos": pos,
                     "done": done, "pm": pm, "ctx": ctx,
                     "vfrom": state["vfrom"]}
        return jnp.moveaxis(ys, 0, 1), new_state

    return seg


def _jit_spec_block(cfg, draft_k: int, ngram: int):
    """ONE speculative block for every row — the batched prompt-lookup
    decode (VERDICT r4 #6). Per dispatch each row drafts `draft_k` tokens
    by n-gram match against its OWN fed history, one _verify_block_rows
    scores all rows' blocks together (the weight stream amortizes across
    rows AND block positions), and each row accepts its prefix-correct
    span: 1..draft_k+1 tokens per row per dispatch at one dispatch's cost.

    The shared write head is PRESERVED: the head always advances by the
    full block width and each row's REJECTED slots are masked out of its
    prompt mask instead of rewound — no per-row write heads, no scatter.
    The price is window burn (blk slots per block regardless of
    acceptance), which the host bounds by falling back to greedy segments
    whenever a spec block could strand a live row (see _spec_admissible).
    """
    import jax
    import jax.numpy as jnp

    from financial_rag_tpu.models.decoder import _pl_drafts, _verify_block_rows

    blk = draft_k + 1
    eos = jnp.int32(cfg.eos_token_id)

    @partial(jax.jit, donate_argnums=(1,))
    def spec(params, state, w0):
        tok, pos, done = state["tok"], state["pos"], state["done"]
        kc, vc, pm = state["kc"], state["vc"], state["pm"]
        ctx, vfrom = state["ctx"], state["vfrom"]
        ctx = jax.lax.dynamic_update_slice(ctx, tok[:, None], (0, w0))
        drafts = jax.vmap(
            lambda c, vf: _pl_drafts(c, w0, vf, ngram=ngram,
                                     draft_k=draft_k))(ctx, vfrom)
        block = jnp.concatenate([tok[:, None], drafts], axis=1)  # [rows, blk]
        logits, kc, vc = _verify_block_rows(params, block, pos, w0, kc, vc,
                                            pm, cfg)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)    # [rows, blk]
        acc = jnp.sum(jnp.cumprod(
            (drafts == preds[:, :draft_k]).astype(jnp.int32), axis=1), axis=1)
        is_eos = preds == eos
        first_eos = jnp.where(is_eos.any(axis=1),
                              jnp.argmax(is_eos, axis=1), blk)
        n_emit = jnp.minimum(acc + 1, first_eos + 1).astype(jnp.int32)
        n_emit = jnp.where(done, jnp.int32(1), n_emit)
        cols = jnp.arange(blk, dtype=jnp.int32)[None, :]
        emit = jnp.where((cols < n_emit[:, None]) & ~done[:, None], preds, eos)
        # record fed/accepted tokens for future lookups; hide this block's
        # rejected slots from the row's future attention
        ctx = jax.lax.dynamic_update_slice(ctx, emit, (0, w0 + 1))
        pm = jax.lax.dynamic_update_slice(pm, cols < n_emit[:, None], (0, w0))
        last = jnp.take_along_axis(emit, (n_emit - 1)[:, None], axis=1)[:, 0]
        done = done | (last == eos) | jnp.take_along_axis(
            is_eos, (n_emit - 1)[:, None], axis=1)[:, 0]
        nxt = jnp.where(done, eos, last)
        new_state = {"kc": kc, "vc": vc, "tok": nxt, "pos": pos + n_emit,
                     "done": done, "pm": pm, "ctx": ctx, "vfrom": vfrom}
        return emit, n_emit, new_state

    return spec


# -------------------------------------------------------------- host side

class _Stream:
    __slots__ = ("q", "cap", "emitted")

    def __init__(self, cap: int) -> None:
        self.q: "queue.Queue" = queue.Queue()
        self.cap = cap
        self.emitted = 0


class ContinuousDecodeEngine:
    """Shared batched decode loop for concurrent greedy token streams.

    submit() returns an iterator of [1, n] int32 numpy token blocks (the
    same block contract as models/decoder.generate_stream) or None when the
    request cannot be admitted (window exhausted while other rows are live,
    or a prompt wider than the layout) — callers fall back to their
    per-request path. A background worker owns the device state; requests
    only touch queues.
    """

    def __init__(self, params, cfg, *, rows: int = 8, t_prompt: int = 4096,
                 window: int = 2048, segment: int = 16, spec_k: int = 7,
                 ngram: int = 3, prefill_impl_fn=None) -> None:
        import jax.numpy as jnp

        self.params = params
        self.cfg = cfg
        self.rows = rows
        self.t_prompt = t_prompt
        # the segment step issues cache writes at [w, w + segment); rounding
        # the window down to a segment multiple guarantees no step ever
        # indexes past t_total (dynamic_update_slice clamping would silently
        # land junk in the last slot otherwise)
        window = max(segment, (window // segment) * segment)
        self.window = window
        self.segment = segment
        self.t_total = t_prompt + window
        # speculative block decode (spec_k drafts + 1 fed token per
        # dispatch); disabled when the window can't even hold one block
        self.spec_k = int(spec_k)
        self.blk = self.spec_k + 1
        self._spec_fn = (_jit_spec_block(cfg, self.spec_k, ngram)
                         if self.spec_k > 0 and self.blk <= window else None)
        self._prefill_impl_fn = prefill_impl_fn or (lambda bucket: "xla")
        self._seg_fn = _jit_segment(cfg, segment)
        self._join_fn = _jit_join(cfg)
        self._prefill_fns: Dict[str, Any] = {}

        dt = params["embed"].dtype if not isinstance(params["embed"], dict) \
            else jnp.bfloat16
        L = (params["layers"]["ln1"].shape[0])
        kv, d = cfg.num_kv_heads, cfg.head_dim
        self._state = {
            "kc": jnp.zeros((L, rows, self.t_total, kv, d), dt),
            "vc": jnp.zeros((L, rows, self.t_total, kv, d), dt),
            "tok": jnp.zeros((rows,), jnp.int32),
            "pos": jnp.zeros((rows,), jnp.int32),
            "done": jnp.ones((rows,), bool),
            "pm": jnp.zeros((rows, self.t_total), bool),
            "ctx": jnp.zeros((rows, self.t_total), jnp.int32),
            "vfrom": jnp.zeros((rows,), jnp.int32),
        }
        self._w = t_prompt                      # host-tracked write head
        self._slots: List[Optional[_Stream]] = [None] * rows
        self._pending: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._closed = False
        self.joins = 0
        self.rejects = 0
        self.segments = 0
        self.spec_blocks = 0
        self.spec_tokens = 0
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="continuous-decode")
        self._worker.start()
        log.info("continuous decode engine up: rows=%d t_prompt=%d "
                 "window=%d segment=%d spec_k=%d cache=%.0fMB", rows,
                 t_prompt, window, segment,
                 self.spec_k if self._spec_fn else 0,
                 2 * self._state["kc"].nbytes / 1e6)

    # ------------------------------------------------------------- public

    def submit(self, input_ids: np.ndarray, attention_mask: np.ndarray,
               max_new: int):
        """input_ids/attention_mask: [1, s] LEFT-padded (s <= t_prompt).
        Returns a token-block iterator, or None if not admissible."""
        s = int(input_ids.shape[1])
        cap = int(max_new)
        if s > self.t_prompt or cap > self.window or cap < 1:
            return None
        with self._lock:
            if self._closed:
                return None
            # admission: `cap` shared-window slots must remain (the window
            # spends one slot per STEP, shared by every row, so each row
            # only needs its own cap of headroom). Rejection — the caller
            # falls back to its per-request path — beats queuing behind an
            # unbounded wait.
            if not self._admissible(cap):
                self.rejects += 1
                return None
            stream = _Stream(cap)
            self._pending.put((input_ids, attention_mask, stream))
            self._wake.notify()
        return self._iter_blocks(stream)

    def stats(self) -> dict:
        return {"joins": self.joins, "rejects": self.rejects,
                "segments": self.segments, "spec_blocks": self.spec_blocks,
                "spec_tokens": self.spec_tokens}

    def close(self) -> None:
        with self._lock:
            self._closed = True
            self._wake.notify()
        self._worker.join(timeout=30)

    # ------------------------------------------------------------ internals

    def _admissible(self, cap: int) -> bool:
        live = any(s is not None for s in self._slots)
        if not live and self._pending.empty():
            return True                          # head resets before the join
        return self._w + cap <= self.t_total

    def _iter_blocks(self, stream: _Stream):
        while True:
            item = stream.q.get()
            if item is None:
                return
            if item is _CLOSED:
                raise RuntimeError("continuous decode engine closed")
            if item is _REJECTED:
                # raced past the admission check before ANY token was
                # emitted; the typed error lets the caller fall back to
                # its per-request stream instead of abandoning streaming
                raise WindowRacedError("continuous decode window exhausted")
            yield item

    def _prefill_for(self, bucket: int):
        impl = self._prefill_impl_fn(bucket)
        key = (bucket, impl)
        if key not in self._prefill_fns:
            self._prefill_fns[key] = _jit_prefill_row(self.cfg, impl)
        return self._prefill_fns[key]

    def _run(self) -> None:
        import jax.numpy as jnp

        try:
            while True:
                with self._lock:
                    while (not self._closed and self._pending.empty()
                           and all(s is None for s in self._slots)):
                        self._wake.wait()
                    if self._closed:
                        break
                self._admit()   # per-request failures contained inside
                if any(s is not None for s in self._slots):
                    # a failure HERE corrupts shared state (the step
                    # donates the caches) — full shutdown is the only safe
                    # response, unlike a single joiner's prefill failure
                    if self._spec_fn is not None and self._spec_admissible():
                        self._step_spec(jnp)
                    else:
                        self._step_segment(jnp)
        except Exception:  # noqa: BLE001 — a dead worker must not hang streams
            log.exception("continuous decode worker died")
            with self._lock:
                self._closed = True
        # drain: fail live + pending streams loudly, not silently
        for s in self._slots:
            if s is not None:
                s.q.put(_CLOSED)
        while not self._pending.empty():
            try:
                self._pending.get_nowait()[2].q.put(_CLOSED)
            except queue.Empty:
                break

    def _admit(self) -> None:
        """Join pending requests into free rows (prefill + cache splice)."""
        import jax.numpy as jnp

        while not self._pending.empty():
            free = [i for i, s in enumerate(self._slots) if s is None]
            if not free:
                return
            with self._lock:
                if all(s is None for s in self._slots):
                    self._w = self.t_prompt      # empty engine: free reset
                try:
                    input_ids, mask, stream = self._pending.get_nowait()
                except queue.Empty:
                    return
                if self._w + stream.cap > self.t_total:
                    # window moved since submission's admission check
                    self.rejects += 1
                    stream.q.put(_REJECTED)
                    continue
                row, w = free[0], self._w
                self.joins += 1
            s = input_ids.shape[1]
            try:
                # prefill touches no shared device state — a failure here
                # (bad bucket compile, transient device error) fails ONLY
                # this stream; the worker and every live row keep going
                tok0, k_seq, v_seq = self._prefill_for(s)(
                    self.params, jnp.asarray(input_ids), jnp.asarray(mask))
            except Exception:  # noqa: BLE001 — contain per-joiner failures
                log.exception("joiner prefill failed; failing one stream")
                stream.q.put(_CLOSED)
                continue
            off = w - s
            pm_row = np.zeros((self.t_total,), bool)
            pm_row[off: w] = mask[0].astype(bool)
            pm_row[w:] = True
            n_real = int(np.asarray(mask).sum())
            # join donates self._state — an exception past this point is
            # fatal (handled by _run's shutdown path)
            self._state = self._join_fn(
                self._state, jnp.int32(row), k_seq, v_seq, jnp.int32(off),
                tok0, jnp.int32(n_real), jnp.asarray(pm_row),
                jnp.asarray(input_ids, jnp.int32), jnp.int32(w - n_real))
            with self._lock:
                self._slots[row] = stream
            # tok0 is the request's first OUTPUT token (prefill's argmax),
            # exactly as generate_tokens emits it
            t0 = int(np.asarray(tok0))
            self._emit(row, np.asarray([t0], np.int32))

    def _spec_admissible(self) -> bool:
        """Spec blocks burn `blk` shared slots while emitting as few as one
        token per row; run one only when afterwards every live row could
        still FINISH on the greedy path (1 slot/step, rows share steps):
        w + blk + max(remaining) <= t_total."""
        with self._lock:
            rem = [s.cap - s.emitted for s in self._slots if s is not None]
        if not rem:
            return False
        return self._w + self.blk + max(rem) <= self.t_total

    def _step_spec(self, jnp) -> None:
        emit, n_emit, self._state = self._spec_fn(self.params, self._state,
                                                  jnp.int32(self._w))
        blocks = np.asarray(emit)                # [rows, blk]
        counts = np.asarray(n_emit)              # [rows]
        with self._lock:
            self._w += self.blk
        self.spec_blocks += 1
        for row, stream in enumerate(self._slots):
            if stream is not None:
                self.spec_tokens += int(counts[row])
                self._emit(row, blocks[row, : counts[row]])

    def _step_segment(self, jnp) -> None:
        toks, self._state = self._seg_fn(self.params, self._state,
                                         jnp.int32(self._w))
        blocks = np.asarray(toks)                # [rows, segment]
        with self._lock:
            self._w += self.segment
        self.segments += 1
        for row, stream in enumerate(self._slots):
            if stream is not None:
                self._emit(row, blocks[row])

    def _emit(self, row: int, toks: np.ndarray) -> None:
        """Push a row's new tokens to its stream; free the row at eos/cap."""
        stream = self._slots[row]
        keep = toks[: max(0, stream.cap - stream.emitted)]
        eos_hits = np.nonzero(keep == self.cfg.eos_token_id)[0]
        hit_eos = eos_hits.size > 0
        if hit_eos:
            keep = keep[: eos_hits[0]]           # trim AT eos (excluded)
        if keep.size:
            stream.q.put(keep[None, :].copy())
            stream.emitted += int(keep.size)
        if hit_eos or stream.emitted >= stream.cap:
            stream.q.put(None)
            with self._lock:     # submit()'s admission check reads _slots
                self._slots[row] = None
