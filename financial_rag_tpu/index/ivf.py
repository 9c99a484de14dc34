"""IVF (inverted-file) cosine index with on-device k-means.

Replaces the capability of the reference's dead pgvector IVFFlat path
(reference pgvector_child_store.py:78-100) with a TPU-shaped design:

- grouped storage [nlist, list_size, D]: every posting list is a fixed-size
  padded tile, so probe gathers are static-shape `jnp.take` calls;
- spherical k-means trained on device (Lloyd's iterations = one batched
  matmul-argmax assignment + segment-sum update per step, all MXU work);
- search: queries x centroids matmul -> top-nprobe lists -> gather probed
  tiles -> fused scoring + top-k over the probed subset.

Note on when to use which index: on TPU, the flat bucketed sweep
(index/flat.py) amortizes one corpus stream over the whole query batch, so
it is usually FASTER than IVF for batched serving up to ~1M vectors ("brute
force at peak FLOP/s"). IVF wins for single-query latency and for corpora
whose stream time exceeds the latency budget (10M+ scale), and composes
with sharding (parallel/) for the 10M-chunk configuration.
"""

from __future__ import annotations

import json
import threading
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from financial_rag_tpu.ops.common import round_up
from financial_rag_tpu.utils import get_logger

log = get_logger("index.ivf")


# ----------------------------------------------------------------- k-means

def _kmeans_pp_init(x: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """k-means++ seeding on cosine distance (spread-out initial centroids)."""
    n = x.shape[0]
    first = int(rng.integers(n))
    centroids = [x[first]]
    best_sim = x @ x[first]
    for _ in range(k - 1):
        d2 = np.maximum(1.0 - best_sim, 1e-9)
        probs = d2 / d2.sum()
        nxt = int(rng.choice(n, p=probs))
        centroids.append(x[nxt])
        best_sim = np.maximum(best_sim, x @ x[nxt])
    return np.stack(centroids)


def kmeans(
    vectors: np.ndarray,       # [N, D] (will be L2-normalized)
    k: int,
    iters: int = 12,
    seed: int = 0,
    n_init: int = 3,
) -> np.ndarray:
    """Spherical k-means: k-means++ init, device Lloyd's iterations,
    empty-cluster reseeding to the worst-fit points, and `n_init` restarts
    keeping the run with the best quantization (mean max-sim) — Lloyd's on
    clustered data has genuine local optima (two seeds in one true cluster
    merging two others). Returns unit-norm centroids [k, D]."""
    x = np.asarray(vectors, np.float32)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n, d = x.shape
    xd = jnp.asarray(x)

    @jax.jit
    def step(c):
        sims = jnp.dot(xd, c.T, preferred_element_type=jnp.float32)     # [N, k]
        assign = jnp.argmax(sims, axis=1)
        fit = jnp.max(sims, axis=1)                                     # per-point best sim
        sums = jax.ops.segment_sum(xd, assign, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), assign, num_segments=k)
        new_c = sums / jnp.maximum(counts[:, None], 1e-9)
        norms = jnp.linalg.norm(new_c, axis=1, keepdims=True)
        new_c = new_c / jnp.maximum(norms, 1e-12)
        new_c = jnp.where(counts[:, None] > 0, new_c, c)
        return new_c, counts, fit

    best_c, best_score = None, -np.inf
    for trial in range(max(n_init, 1)):
        rng = np.random.default_rng(seed + 7919 * trial)
        init = _kmeans_pp_init(x, k, rng) if n >= k else x[rng.choice(n, size=k)]
        c = jnp.asarray(init)
        fit = None
        for _ in range(iters):
            c, counts, fit = step(c)
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
        if dtype == jnp.int8:
            # IVF scores probed tiles with a direct einsum (no int8 dequant
            # path like ops/topk._tile_scores); int8 storage would truncate
            # unit vectors to zero. Coerce — IVF's HBM win comes from
            # probing, not storage dtype.
            log.warning("IVFIndex does not support int8 storage; using bfloat16")
            dtype = jnp.bfloat16
        self.dtype = dtype
        self.name = name

        self.centroids: Optional[jnp.ndarray] = None       # [nlist, D] f32
        self._storage = jnp.zeros((nlist, self.list_size, dim), dtype)
        self._valid = jnp.zeros((nlist, self.list_size), jnp.float32)
        self._ids = np.zeros((nlist, self.list_size), np.int64)
        self._fill = np.zeros(nlist, np.int32)              # next free slot per list
        self._loc_of: Dict[int, Tuple[int, int]] = {}       # child_id -> (list, slot)
        self._lock = threading.Lock()
        self._search_fn = None

    def __len__(self) -> int:
        return len(self._loc_of)

    def count(self) -> int:
        return len(self._loc_of)

    @property
    def is_trained(self) -> bool:
        return self.centroids is not None

    def train(self, vectors: np.ndarray, iters: int = 12, seed: int = 0) -> None:
        self.centroids = jnp.asarray(kmeans(vectors, self.nlist, iters=iters, seed=seed))
        self._search_fn = None

    # ------------------------------------------------------------- updates

    def _assignments(self, vectors: np.ndarray, depth: int = 4) -> np.ndarray:
        """Top-`depth` candidate lists per vector (for overflow fallback)."""
        sims = np.asarray(jnp.dot(jnp.asarray(vectors, jnp.float32), self.centroids.T))
        return np.argsort(-sims, axis=1, kind="stable")[:, :depth]

    def upsert(self, ids: Sequence[int], vectors: np.ndarray) -> None:
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

            li_a = jnp.asarray(np.asarray(lists, np.int32))
            sl_a = jnp.asarray(np.asarray(slots, np.int32))
            self._storage = self._storage.at[li_a, sl_a].set(jnp.asarray(vectors, self.dtype))
            self._valid = self._valid.at[li_a, sl_a].set(1.0)

    def _grow_and_place(self, li: int) -> Tuple[int, int]:
        new_ls = self.list_size * 2
        log.info("growing IVF lists: %d -> %d", self.list_size, new_ls)
        pad = new_ls - self.list_size
        self._storage = jnp.pad(self._storage, ((0, 0), (0, pad), (0, 0)))
        self._valid = jnp.pad(self._valid, ((0, 0), (0, pad)))
        self._ids = np.pad(self._ids, ((0, 0), (0, pad)))
        self.list_size = new_ls
        self._search_fn = None
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
            vecs = np.asarray(self._storage, np.float32)[locs[:, 0], locs[:, 1]]

            self.centroids = None
            self._storage = jnp.zeros_like(self._storage)
            self._valid = jnp.zeros_like(self._valid)
            self._ids[:] = 0
            self._fill[:] = 0
            self._loc_of = {}
            self._search_fn = None
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
            if lists:
                self._valid = self._valid.at[
                    jnp.asarray(np.asarray(lists, np.int32)),
                    jnp.asarray(np.asarray(slots, np.int32))].set(0.0)
            return len(lists)

    # -------------------------------------------------------------- search

    def _build_search(self, k: int, nprobe: int):
        # storage / valid / centroids are jit ARGUMENTS, not closure
        # captures, so incremental upsert/delete/retrain are immediately
        # visible to search (same discipline as FlatIndex._dispatch) and
        # the compiled fn stays valid across mutations of equal shape.
        ls = self.list_size

        @jax.jit
        def run(queries, storage, valid, centroids):         # [B, D] f32
            q = queries.astype(jnp.float32)
            csims = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
            _, probes = jax.lax.top_k(csims, nprobe)         # [B, P]
            qd = q.astype(storage.dtype)

            # Scan over probes: one [B, L, D] tile gather + batched dot per
            # step instead of materializing all [B, P, L, D] tiles at once —
            # peak HBM is P-fold lower at identical FLOPs, which is what
            # makes large-list geometries (big capacity / few lists) viable.
            def probe_step(_, probe_col):                    # probe_col [B]
                tile = jnp.take(storage, probe_col, axis=0)  # [B, L, D]
                vrow = jnp.take(valid, probe_col, axis=0)    # [B, L]
                s = jnp.einsum("bd,bld->bl", qd, tile,
                               preferred_element_type=jnp.float32)
                return 0, s + (vrow - 1.0) * 1.0e5

            _, scores = jax.lax.scan(probe_step, 0, probes.T)   # [P, B, L]
            flat = scores.transpose(1, 0, 2).reshape(q.shape[0], nprobe * ls)
            top_s, pos = jax.lax.top_k(flat, k)
            p_idx = pos // ls
            s_idx = pos % ls
            l_idx = jnp.take_along_axis(probes, p_idx, axis=1)
            return top_s, l_idx, s_idx

        return run

    def search(self, queries: np.ndarray, top_k: int, *, nprobe: Optional[int] = None,
               chunk: int = 16) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (child_ids [B, k] int64, scores [B, k] f32)."""
        assert self.is_trained
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        b = queries.shape[0]
        nprobe = nprobe or self.nprobe
        if not self._loc_of:
            return np.zeros((b, top_k), np.int64), np.full((b, top_k), -np.inf, np.float32)

        key = (top_k, nprobe, self.list_size)
        if self._search_fn is None or self._search_fn[0] != key:
            self._search_fn = (key, self._build_search(top_k, nprobe))
        run = self._search_fn[1]

        out_ids = np.zeros((b, top_k), np.int64)
        out_scores = np.full((b, top_k), -np.inf, np.float32)
        for lo in range(0, b, chunk):
            qa = queries[lo: lo + chunk]
            pad = 0
            if qa.shape[0] < chunk:
                pad = chunk - qa.shape[0]
                qa = np.pad(qa, ((0, pad), (0, 0)))
            s, li, sl = run(jnp.asarray(qa), self._storage, self._valid, self.centroids)
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

    # ------------------------------------------------------------- tuning

    def sample_vectors(self, n: int, seed: int = 0) -> np.ndarray:
        """Up to `n` live stored vectors (host f32), uniformly sampled.
        Fetches only the sampled rows (device gather), so it stays cheap at
        10M scale."""
        with self._lock:
            locs = list(self._loc_of.values())
        rng = np.random.default_rng(seed)
        if len(locs) > n:
            sel = rng.choice(len(locs), size=n, replace=False)
            locs = [locs[i] for i in sel]
        la = jnp.asarray(np.asarray([l for l, _ in locs], np.int32))
        sa = jnp.asarray(np.asarray([s for _, s in locs], np.int32))
        return np.asarray(self._storage[la, sa], np.float32)

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
        atomic_savez(
            d / f"{self.name}.npz",
            centroids=np.asarray(self.centroids, np.float32),
            storage=np.asarray(self._storage, np.float32),
            valid=np.asarray(self._valid),
            ids=self._ids,
            fill=self._fill,
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
        idx._storage = jnp.asarray(data["storage"], idx.dtype)
        idx._valid = jnp.asarray(data["valid"])
        idx._ids = data["ids"]
        idx._fill = data["fill"]
        valid = data["valid"]
        idx._loc_of = {
            int(idx._ids[li, sl]): (li, sl)
            for li, sl in zip(*np.nonzero(valid > 0))
        }
        return idx
