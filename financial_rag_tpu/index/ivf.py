"""IVF (inverted-file) cosine index with on-device k-means.

Replaces the capability of the reference's dead pgvector IVFFlat path
(reference pgvector_child_store.py:78-100) with a TPU-shaped design:

- grouped storage [nlist, list_size, D]: every posting list is a fixed-size
  padded tile, so each probe is one contiguous HBM block;
- spherical k-means trained on device (Lloyd's iterations = one batched
  matmul-argmax assignment + segment-sum update per step, all MXU work);
- search: queries x centroids matmul -> top-nprobe lists -> Pallas fused
  gather+score kernel (ops/ivf_probe.py: probe ids ride as scalar-prefetch
  args driving the BlockSpec index_map, so probed tiles stream HBM->VMEM as
  double-buffered contiguous DMAs) -> top-k over the probed subset;
- int8 storage supported with the same per-vector dequantization-weight
  scheme as the flat index (index/persist.encode_payload): weights ride in
  the validity array, the kernel does a raw int8xint8 MXU dot and
  dequantizes by weight, the wrapper applies the per-query scale.

Note on when to use which index: on TPU, the flat bucketed sweep
(index/flat.py) amortizes one corpus stream over the whole query batch, so
it is usually FASTER than IVF for batched serving up to ~1M vectors ("brute
force at peak FLOP/s"). IVF wins for single-query latency and for corpora
whose stream time exceeds the latency budget (10M+ scale), and composes
with sharding (parallel/) for the 10M-chunk configuration.
"""

from __future__ import annotations

import json
from functools import partial
import threading
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from financial_rag_tpu.ops.common import round_up
from financial_rag_tpu.ops.ivf_probe import probe_scores, probe_scores_reference
from financial_rag_tpu.ops.topk import NEG, quantize_queries
from financial_rag_tpu.utils import get_logger

log = get_logger("index.ivf")


@partial(jax.jit, donate_argnums=(0, 1))
def _donated_scatter2(storage, valid, li, sl, payload, weights):
    """In-place grouped-storage update (donation avoids the .at[].set
    copy-on-write that would double peak HBM during ingest)."""
    return storage.at[li, sl].set(payload), valid.at[li, sl].set(weights)


# ----------------------------------------------------------------- k-means

@partial(jax.jit, static_argnums=(1,))
def _kmeans_pp_init(xd: jnp.ndarray, k: int, seed) -> jnp.ndarray:
    """k-means++ seeding on cosine distance, entirely on device.

    The classic algorithm is a serial host loop (k rounds of "sample a
    point with probability ∝ distance²") — at nlist=4096 over a 200k
    sample that is minutes of host matvecs. Here each round instead
    samples via the Gumbel-max trick (argmax(log d² + Gumbel) draws
    exactly ∝ d², see PAPERS.md on reservoir/Gumbel sampling folklore),
    so the whole init is one lax.fori_loop of matvec + max-update with no
    host round-trips: ~2s where the host loop took minutes."""
    n, d = xd.shape
    key0 = jax.random.PRNGKey(seed)
    key0, sub = jax.random.split(key0)
    first = jax.random.randint(sub, (), 0, n)
    c0 = jnp.zeros((k, d), jnp.float32).at[0].set(xd[first])
    best0 = jnp.dot(xd, xd[first], preferred_element_type=jnp.float32)

    def step(i, carry):
        c, best_sim, key = carry
        key, sub = jax.random.split(key)
        d2 = jnp.maximum(1.0 - best_sim, 1e-9)
        nxt = jnp.argmax(jnp.log(d2) + jax.random.gumbel(sub, (n,)))
        cnew = xd[nxt]
        c = c.at[i].set(cnew)
        best_sim = jnp.maximum(best_sim, jnp.dot(xd, cnew, preferred_element_type=jnp.float32))
        return c, best_sim, key

    c, _, _ = jax.lax.fori_loop(1, k, step, (c0, best0, key0))
    return c


def kmeans(
    vectors: np.ndarray,       # [N, D] (will be L2-normalized)
    k: int,
    iters: int = 12,
    seed: int = 0,
    n_init: Optional[int] = None,
) -> np.ndarray:
    """Spherical k-means: device k-means++ init, device Lloyd's iterations,
    empty-cluster reseeding to the worst-fit points, and `n_init` restarts
    keeping the run with the best quantization (mean max-sim) — Lloyd's on
    clustered data has genuine local optima (two seeds in one true cluster
    merging two others). `n_init` defaults to 3 for small k and 1 for
    k >= 1024 (restart variance shrinks with k while restart cost grows).
    Returns unit-norm centroids [k, D]."""
    if n_init is None:
        n_init = 3 if k < 1024 else 1
    x = np.asarray(vectors, np.float32)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n, d = x.shape
    xd = jnp.asarray(x)

    # the corpus sample rides as a jit ARGUMENT, not a closure constant:
    # closed-over arrays are baked into the compile payload, which the
    # remote-compile tunnel rejects above ~400MB (and bloats cache keys)
    @partial(jax.jit, static_argnums=(2,))
    def step(xa, c, k):
        sims = jnp.dot(xa, c.T, preferred_element_type=jnp.float32)     # [N, k]
        assign = jnp.argmax(sims, axis=1)
        fit = jnp.max(sims, axis=1)                                     # per-point best sim
        sums = jax.ops.segment_sum(xa, assign, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones(xa.shape[:1], jnp.float32), assign,
                                     num_segments=k)
        new_c = sums / jnp.maximum(counts[:, None], 1e-9)
        norms = jnp.linalg.norm(new_c, axis=1, keepdims=True)
        new_c = new_c / jnp.maximum(norms, 1e-12)
        new_c = jnp.where(counts[:, None] > 0, new_c, c)
        return new_c, counts, fit

    best_c, best_score = None, -np.inf
    for trial in range(max(n_init, 1)):
        if n >= k:
            c = _kmeans_pp_init(xd, k, seed + 7919 * trial)
        else:
            rng = np.random.default_rng(seed + 7919 * trial)
            c = jnp.asarray(x[rng.choice(n, size=k)])
        fit = None
        for _ in range(iters):
            c, counts, fit = step(xd, c, k)
            empty = np.nonzero(np.asarray(counts) == 0)[0]
            if len(empty):
                # reseed each empty cluster at the point fitting worst; with
                # fewer points than empty clusters (tiny first streaming
                # batch, k > n) cycle the points — duplicate centroids are
                # harmless and get separated as the corpus grows
                worst = np.argsort(np.asarray(fit))[: len(empty)]
                if len(worst) < len(empty):
                    worst = np.resize(worst, len(empty))
                c = c.at[jnp.asarray(empty)].set(xd[jnp.asarray(worst)])
        score = float(np.asarray(fit).mean())
        if score > best_score:
            best_c, best_score = np.asarray(c), score
    return best_c


def recommended_nlist(capacity: int) -> int:
    """Power-of-two nlist ≈ 4·√N.

    Balances the two HBM costs of a probe: the centroid scan (B × nlist
    matmul, grows with nlist) and the probed tiles (nprobe × N/nlist × D,
    shrinks with nlist). At the √N·const sweet spot a 1M-chunk corpus gets
    4096 lists of ~256 vectors — per-query probe traffic ~25x below a flat
    sweep at equal recall (nprobe=32). Clamped to [64, 65536]."""
    import math

    target = 4.0 * math.sqrt(max(capacity, 1))
    return max(64, min(1 << 16, 1 << round(math.log2(target))))


# ------------------------------------------------------------------- index

class IVFIndex:
    def __init__(
        self,
        dim: int = 384,
        nlist: int = 256,
        list_size: int = 256,
        nprobe: int = 32,
        *,
        dtype=jnp.bfloat16,
        name: str = "children_ivf",
    ) -> None:
        self.dim = dim
        self.nlist = nlist
        self.list_size = round_up(list_size, 128)
        self.nprobe = min(nprobe, nlist)
        self.dtype = dtype
        self.name = name

        self.centroids: Optional[jnp.ndarray] = None       # [nlist, D] f32
        self._storage = jnp.zeros((nlist, self.list_size, dim), dtype)
        self._valid = jnp.zeros((nlist, self.list_size), jnp.float32)
        self._ids = np.zeros((nlist, self.list_size), np.int64)
        self._fill = np.zeros(nlist, np.int32)              # high-water slot per list
        # tombstoned slots awaiting reuse, per list: delete pushes, upsert
        # pops before advancing the high-water mark — delete-heavy churn
        # keeps occupancy bounded instead of forcing list growth or a full
        # retrain (VERDICT r2 #7)
        self._free: Dict[int, List[int]] = {}
        self._loc_of: Dict[int, Tuple[int, int]] = {}       # child_id -> (list, slot)
        # mutation epoch: bumped by every upsert/delete/retrain. A deferred
        # search materializer resolves device hits through the HOST _ids
        # map — if a mutation (e.g. tombstone-slot reuse) lands between
        # dispatch and materialize, that map no longer describes the
        # storage snapshot the scores came from, so the materializer
        # detects the epoch change and re-runs the search (bounded, then
        # fully under the lock).
        self._mut = 0
        self._lock = threading.Lock()
        # keyed by (k, nprobe, list_size); storage rides as jit args, so
        # mutations never require invalidation — only shape changes key anew
        self._search_fns: Dict[Tuple, object] = {}

    def __len__(self) -> int:
        return len(self._loc_of)

    def count(self) -> int:
        return len(self._loc_of)

    @property
    def is_trained(self) -> bool:
        return self.centroids is not None

    def train(self, vectors: np.ndarray, iters: int = 12, seed: int = 0) -> None:
        self.centroids = jnp.asarray(kmeans(vectors, self.nlist, iters=iters, seed=seed))

    # ------------------------------------------------------------- updates

    def _assignments(self, vectors: np.ndarray, depth: int = 4,
                     chunk: int = 8192) -> np.ndarray:
        """Top-`depth` candidate lists per vector (for overflow fallback).
        Device top-k (a host argsort over [batch, nlist] dominates ingest at
        nlist >= 4096), chunked so the [chunk, nlist] sims matrix stays
        small next to 10M-scale storage."""
        depth = min(depth, self.nlist)
        outs = []
        for lo in range(0, len(vectors), chunk):
            sims = jnp.dot(jnp.asarray(vectors[lo: lo + chunk], jnp.float32),
                           self.centroids.T, preferred_element_type=jnp.float32)
            _, idx = jax.lax.top_k(sims, depth)
            outs.append(np.asarray(idx))
        return np.concatenate(outs, axis=0)

    def upsert(self, ids: Sequence[int], vectors: np.ndarray) -> None:
        if not len(ids):  # empty ingest batch (document with no children)
            return
        if not self.is_trained:
            # auto-train on the first batch (k-means needs some corpus; a
            # small first batch still works — duplicated centroids are
            # handled by the empty-cluster rule)
            log.info("IVF auto-training on first upsert batch (%d vectors)", len(vectors))
            self.train(np.asarray(vectors, np.float32))
        vectors = np.asarray(vectors, np.float32)
        vectors = vectors / np.maximum(np.linalg.norm(vectors, axis=1, keepdims=True), 1e-12)
        cand = self._assignments(vectors)

        with self._lock:
            lists, slots = [], []
            for j, cid in enumerate(ids):
                cid = int(cid)
                old = self._loc_of.get(cid)
                if old is not None:
                    li, sl = old
                else:
                    li = sl = None
                    for c in cand[j]:
                        free = self._free.get(int(c))
                        if free:
                            li, sl = int(c), free.pop()
                            break
                        if self._fill[c] < self.list_size:
                            li, sl = int(c), int(self._fill[c])
                            self._fill[c] += 1
                            break
                    if li is None:
                        li, sl = self._grow_and_place(int(cand[j][0]))
                    self._loc_of[cid] = (li, sl)
                    self._ids[li, sl] = cid
                lists.append(li)
                slots.append(sl)

            from financial_rag_tpu.index.persist import encode_payload, pad_pow2

            payload, weights = encode_payload(vectors, self.dtype)
            # donated in-place scatter (peak HBM 1x storage); power-of-two
            # padding keeps the compile count logarithmic in batch size.
            # validity doubles as the per-row dequantization weight (1.0
            # for float dtypes, max|v|/127 for int8 — ops/topk._weighted_mask)
            li_np, sl_np, payload, weights = pad_pow2(
                np.asarray(lists, np.int32), np.asarray(slots, np.int32),
                payload, weights)
            self._storage, self._valid = _donated_scatter2(
                self._storage, self._valid, jnp.asarray(li_np), jnp.asarray(sl_np),
                payload, jnp.asarray(weights))
            self._mut += 1

    def _grow_and_place(self, li: int) -> Tuple[int, int]:
        new_ls = self.list_size * 2
        log.info("growing IVF lists: %d -> %d", self.list_size, new_ls)
        pad = new_ls - self.list_size
        self._storage = jnp.pad(self._storage, ((0, 0), (0, pad), (0, 0)))
        self._valid = jnp.pad(self._valid, ((0, 0), (0, pad)))
        self._ids = np.pad(self._ids, ((0, 0), (0, pad)))
        self.list_size = new_ls
        sl = int(self._fill[li])
        self._fill[li] += 1
        return li, sl

    def retrain(self, iters: int = 12, seed: int = 0) -> None:
        """Re-fit centroids on the current contents and reassign every
        vector (k-means refresh for corpus drift). Ids are stable."""
        with self._lock:
            live = sorted(self._loc_of.items(), key=lambda kv: kv[1])
            if not live:
                return
            ids = [cid for cid, _ in live]
            locs = np.asarray([loc for _, loc in live])
            # raw payload x per-row weight == unit vector for every dtype
            # (weight is 1.0 for floats, max|v|/127 for int8)
            vecs = np.asarray(self._storage, np.float32)[locs[:, 0], locs[:, 1]]
            vecs = vecs * np.asarray(self._valid)[locs[:, 0], locs[:, 1], None]

            self.centroids = None
            self._storage = jnp.zeros_like(self._storage)
            self._valid = jnp.zeros_like(self._valid)
            self._ids[:] = 0
            self._fill[:] = 0
            self._free = {}
            self._loc_of = {}
            self._mut += 1
        self.train(vecs, iters=iters, seed=seed)
        self.upsert(ids, vecs)
        log.info("IVF retrained on %d vectors (%d lists)", len(ids), self.nlist)

    def delete(self, ids: Sequence[int]) -> int:
        with self._lock:
            lists, slots = [], []
            for cid in ids:
                loc = self._loc_of.pop(int(cid), None)
                if loc is not None:
                    lists.append(loc[0])
                    slots.append(loc[1])
                    self._ids[loc[0], loc[1]] = 0
                    self._free.setdefault(loc[0], []).append(loc[1])
            if lists:
                self._valid = self._valid.at[
                    jnp.asarray(np.asarray(lists, np.int32)),
                    jnp.asarray(np.asarray(slots, np.int32))].set(0.0)
                self._mut += 1
            return len(lists)

    # -------------------------------------------------------------- search

    def _build_search(self, k: int, nprobe: int):
        # storage / valid / centroids are jit ARGUMENTS, not closure
        # captures, so incremental upsert/delete/retrain are immediately
        # visible to search (same discipline as FlatIndex._dispatch) and
        # the compiled fn stays valid across mutations of equal shape.
        ls = self.list_size
        # native Pallas kernel on TPU; compiled XLA scan elsewhere
        # (interpret-mode Pallas steps the grid in Python — test-only)
        probe_fn = (probe_scores if jax.default_backend() == "tpu"
                    else probe_scores_reference)

        @jax.jit
        def run(queries, storage, valid, centroids):         # [B, D] f32
            q = queries.astype(jnp.float32)
            csims = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
            _, probes = jax.lax.top_k(csims, nprobe)         # [B, P]

            qq, qscale = quantize_queries(q, storage.dtype)
            scores = probe_fn(qq, storage, valid, probes)    # [B, P, L] f32
            flat = scores.reshape(q.shape[0], nprobe * ls)
            top_s, pos = jax.lax.top_k(flat, k)
            if qscale is not None:
                # rescale live raw int8 scores; masked slots (~-1e5 < NEG)
                # stay below the downstream validity threshold
                top_s = jnp.where(top_s > NEG, top_s * qscale, top_s)
            p_idx = pos // ls
            s_idx = pos % ls
            l_idx = jnp.take_along_axis(probes, p_idx, axis=1)
            return top_s, l_idx, s_idx

        return run

    def search_begin(self, queries: np.ndarray, top_k: int, *,
                     nprobe: Optional[int] = None, chunk: int = 16):
        """Dispatch-only search: enqueue every device chunk and return a
        zero-arg materializer producing (ids [B, k] int64, scores [B, k]
        f32). Callers driving several independent IVF programs (sharded
        partitions, dual-model indexes) begin them ALL before materializing
        any — the round-trip latencies overlap instead of serializing
        (VERDICT r2 #6; same discipline as FlatIndex.search_begin and
        Encoder.encode_begin)."""
        assert self.is_trained
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        b = queries.shape[0]
        nprobe = nprobe or self.nprobe
        if not self._loc_of:
            return lambda: (np.zeros((b, top_k), np.int64),
                            np.full((b, top_k), -np.inf, np.float32))

        # pad small request batches to 8 rather than the full serving chunk:
        # every padded row streams nprobe full tiles, so a 3-variant query
        # padded to 16 would pay 5x its probe traffic
        if b <= 8 < chunk:
            chunk = 8

        def dispatch():
            pending = []   # (lo, pad, device (s, li, sl))
            mut0 = None
            for lo in range(0, b, chunk):
                qa = queries[lo: lo + chunk]
                pad = 0
                if qa.shape[0] < chunk:
                    pad = chunk - qa.shape[0]
                    qa = np.pad(qa, ((0, pad), (0, 0)))
                # fn selection AND dispatch under the lock: the compiled fn
                # bakes in list_size (a concurrent _grow_and_place would
                # invalidate it mid-flight), and a donated in-place upsert
                # invalidates the old storage buffer (_donated_scatter2).
                # Keyed cache: the nprobe auto-tune sweep revisits many
                # (k, nprobe) pairs — one compile each, ever.
                with self._lock:
                    if mut0 is None:
                        mut0 = self._mut
                    key = (top_k, nprobe, self.list_size)
                    run = self._search_fns.get(key)
                    if run is None:
                        run = self._build_search(top_k, nprobe)
                        self._search_fns[key] = run
                    out = run(jnp.asarray(qa), self._storage, self._valid,
                              self.centroids)
                pending.append((lo, pad, out))
            return mut0, pending

        def resolve(pending):
            out_ids = np.zeros((b, top_k), np.int64)
            out_scores = np.full((b, top_k), -np.inf, np.float32)
            for lo, pad, (s, li, sl) in pending:
                s, li, sl = np.array(s), np.array(li), np.array(sl)
                if pad:
                    s, li, sl = s[:-pad], li[:-pad], sl[:-pad]
                ids = self._ids[li, sl]
                bad = s < -100.0
                ids[bad] = 0
                s[bad] = -np.inf
                out_ids[lo: lo + len(ids)] = ids
                out_scores[lo: lo + len(s)] = s
            return out_ids, out_scores

        mut0, pending = dispatch()

        def materialize() -> Tuple[np.ndarray, np.ndarray]:
            # hits resolve through the HOST _ids map; a mutation between
            # dispatch and this resolution (tombstone-slot reuse, retrain)
            # means that map no longer describes the storage snapshot the
            # scores came from. Detect via the epoch and re-run — twice
            # optimistically, then once atomically under the lock (the
            # deferred-materialize window spans a full RPC in the serving
            # batcher, so this is reachable under churn).
            m0, p = mut0, pending
            for _ in range(2):
                out = resolve(p)
                # epoch re-check UNDER THE LOCK: every mutator rewrites
                # _ids/_free in place while holding _lock and bumps _mut as
                # its last step, so a lock-free `self._mut == m0` could pass
                # while a writer has already rewritten _ids but not yet
                # bumped (the classic broken-seqlock window). Taking the
                # lock here means any in-progress mutation finishes (and its
                # bump becomes visible) before we accept the optimistic
                # resolve — a torn read above is then always detected.
                with self._lock:
                    clean = self._mut == m0
                if clean:
                    return out
                m0, p = dispatch()
            with self._lock:
                # fully consistent: mutations take this lock
                key = (top_k, nprobe, self.list_size)
                run = self._search_fns.get(key)
                if run is None:
                    run = self._build_search(top_k, nprobe)
                    self._search_fns[key] = run
                out_ids = np.zeros((b, top_k), np.int64)
                out_scores = np.full((b, top_k), -np.inf, np.float32)
                for lo in range(0, b, chunk):
                    qa = queries[lo: lo + chunk]
                    pad = chunk - qa.shape[0] if qa.shape[0] < chunk else 0
                    if pad:
                        qa = np.pad(qa, ((0, pad), (0, 0)))
                    s, li, sl = run(jnp.asarray(qa), self._storage,
                                    self._valid, self.centroids)
                    s, li, sl = np.array(s), np.array(li), np.array(sl)
                    if pad:
                        s, li, sl = s[:-pad], li[:-pad], sl[:-pad]
                    ids = self._ids[li, sl]
                    bad = s < -100.0
                    ids[bad] = 0
                    s[bad] = -np.inf
                    out_ids[lo: lo + len(ids)] = ids
                    out_scores[lo: lo + len(s)] = s
                return out_ids, out_scores

        return materialize

    def search(self, queries: np.ndarray, top_k: int, *, nprobe: Optional[int] = None,
               chunk: int = 16) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (child_ids [B, k] int64, scores [B, k] f32)."""
        return self.search_begin(queries, top_k, nprobe=nprobe, chunk=chunk)()

    # ------------------------------------------------------------- tuning

    def sample_vectors(self, n: int, seed: int = 0) -> np.ndarray:
        """Up to `n` live stored vectors (host f32), uniformly sampled.
        Fetches only the sampled rows (device gather), so it stays cheap at
        10M scale."""
        rng = np.random.default_rng(seed)
        with self._lock:
            locs = list(self._loc_of.values())
            if len(locs) > n:
                sel = rng.choice(len(locs), size=n, replace=False)
                locs = [locs[i] for i in sel]
            la = jnp.asarray(np.asarray([l for l, _ in locs], np.int32))
            sa = jnp.asarray(np.asarray([s for _, s in locs], np.int32))
            # gather dispatched under the lock: a donated upsert racing this
            # would invalidate the storage buffer mid-dispatch
            raw = np.asarray(self._storage[la, sa], np.float32)
            w = np.asarray(self._valid[la, sa], np.float32)
        return raw * w[:, None]

    def tune_nprobe(self, **kwargs) -> dict:
        """Pick the smallest nprobe meeting a recall target; see
        financial_rag_tpu.index.tuning.tune_nprobe."""
        from financial_rag_tpu.index.tuning import tune_nprobe

        return tune_nprobe(self, **kwargs)

    # ---------------------------------------------------------- persistence

    def save(self, directory: str | Path) -> None:
        from financial_rag_tpu.index.persist import (
            atomic_savez, atomic_write_json, dtype_name)

        d = Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        # snapshot under the lock (donated upserts invalidate old buffers)
        with self._lock:
            cents_h = np.asarray(self.centroids, np.float32)
            storage_h = np.asarray(self._storage, np.float32)
            valid_h = np.asarray(self._valid)
            ids_h = self._ids.copy()
            fill_h = self._fill.copy()
        atomic_savez(
            d / f"{self.name}.npz",
            centroids=cents_h,
            storage=storage_h,
            valid=valid_h,
            ids=ids_h,
            fill=fill_h,
        )
        atomic_write_json(d / f"{self.name}.manifest.json", {
            "name": self.name, "dim": self.dim, "nlist": self.nlist,
            "list_size": self.list_size, "nprobe": self.nprobe,
            "count": self.count(), "dtype": dtype_name(self.dtype),
        })

    @classmethod
    def load(cls, directory: str | Path, name: str = "children_ivf", **kwargs) -> "IVFIndex":
        from financial_rag_tpu.index.persist import STR_TO_DTYPE

        d = Path(directory)
        manifest = json.loads((d / f"{name}.manifest.json").read_text())
        data = np.load(d / f"{name}.npz")
        saved_dtype = manifest.get("dtype")
        if "dtype" not in kwargs and saved_dtype in STR_TO_DTYPE:
            kwargs["dtype"] = STR_TO_DTYPE[saved_dtype]
        idx = cls(dim=manifest["dim"], nlist=manifest["nlist"],
                  list_size=manifest["list_size"], nprobe=manifest["nprobe"],
                  name=name, **kwargs)
        idx.centroids = jnp.asarray(data["centroids"])
        if STR_TO_DTYPE.get(saved_dtype, jnp.bfloat16) == idx.dtype:
            # same dtype: raw payload + weights reload verbatim
            idx._storage = jnp.asarray(data["storage"], idx.dtype)
            idx._valid = jnp.asarray(data["valid"])
        else:
            # dtype changed between save and load: decode raw payload to
            # unit-vector space by its saved weights, re-encode for the new
            # dtype; empty slots keep weight 0 (encode of a zero row would
            # otherwise mark it live)
            from financial_rag_tpu.index.persist import decode_payload, encode_payload

            nl, ls, dim = data["storage"].shape
            raw2d = data["storage"].reshape(nl * ls, dim)
            w2d = data["valid"].reshape(nl * ls)
            unit = decode_payload(raw2d, saved_dtype, weights=w2d)
            payload, weights = encode_payload(unit, idx.dtype)
            idx._storage = payload.reshape(nl, ls, dim)
            idx._valid = jnp.asarray(
                np.where(w2d > 0, weights, 0.0).astype(np.float32).reshape(nl, ls))
        idx._ids = data["ids"]
        idx._fill = data["fill"]
        valid = data["valid"]
        idx._loc_of = {
            int(idx._ids[li, sl]): (li, sl)
            for li, sl in zip(*np.nonzero(valid > 0))
        }
        # rebuild per-list free lists: tombstoned slots below the
        # high-water mark (valid == 0, slot < fill) are reusable
        for li, sl in zip(*np.nonzero(valid <= 0)):
            if sl < idx._fill[li]:
                idx._free.setdefault(int(li), []).append(int(sl))
        return idx
