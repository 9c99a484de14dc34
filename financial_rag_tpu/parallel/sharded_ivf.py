"""Corpus-sharded IVF index: one IVF partition per device.

Completes the 10M-chunk configuration (SURVEY.md §7.2 step 7 /
BASELINE configs[4]): vectors route round-robin across shards, each shard
is a self-contained IVFIndex whose arrays live on its own device
(`jax.device_put` placement), searches fan out per shard and merge
host-side (k × n_shards candidates — trivial). Combines IVF's bounded
per-query HBM traffic with multi-chip capacity.

Unlike ShardedFlatIndex (one shard_map program over a mesh), shards here
are independent programs: IVF probing is data-dependent per query, so
per-device dispatch + host merge is the simpler correct structure, and
search latency is one device roundtrip per shard (dispatched back-to-back,
overlapping on hardware).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from financial_rag_tpu.index.ivf import IVFIndex
from financial_rag_tpu.utils import get_logger

log = get_logger("parallel.sharded_ivf")


class ShardedIVFIndex:
    def __init__(
        self,
        dim: int = 384,
        n_shards: Optional[int] = None,
        nlist: int = 256,
        list_size: int = 256,
        nprobe: int = 32,
        *,
        devices: Optional[list] = None,
        dtype=None,
        name: str = "children_ivf_sharded",
    ) -> None:
        self.devices = devices if devices is not None else jax.devices()
        if n_shards:
            self.devices = self.devices[:n_shards]
        self.n_shards = len(self.devices)
        self.dim = dim
        self.name = name
        import jax.numpy as jnp

        dtype = dtype if dtype is not None else jnp.bfloat16
        self.shards: List[IVFIndex] = [
            IVFIndex(dim=dim, nlist=nlist, list_size=list_size, nprobe=nprobe,
                     dtype=dtype, name=f"{name}_{i}")
            for i in range(self.n_shards)
        ]
        self._owner: Dict[int, int] = {}   # child_id -> shard
        self._rr = 0
        self._lock = threading.Lock()

    def __len__(self) -> int:
        return len(self._owner)

    def count(self) -> int:
        return len(self._owner)

    @property
    def is_trained(self) -> bool:
        return all(s.is_trained for s in self.shards)

    @property
    def nlist(self) -> int:
        return self.shards[0].nlist

    @property
    def nprobe(self) -> int:
        return self.shards[0].nprobe

    @nprobe.setter
    def nprobe(self, value: int) -> None:
        for s in self.shards:
            s.nprobe = min(int(value), s.nlist)

    def train(self, vectors: np.ndarray, iters: int = 12, seed: int = 0) -> None:
        """All shards learn centroids from the same sample (routing is
        round-robin, so every shard sees the same distribution)."""
        for i, (shard, dev) in enumerate(zip(self.shards, self.devices)):
            with jax.default_device(dev):
                shard.train(vectors, iters=iters, seed=seed + i)

    def upsert(self, ids: Sequence[int], vectors: np.ndarray) -> None:
        vectors = np.asarray(vectors, np.float32)
        with self._lock:
            routed: Dict[int, Tuple[List[int], List[int]]] = {}
            for j, cid in enumerate(ids):
                cid = int(cid)
                shard = self._owner.get(cid)
                if shard is None:
                    shard = self._rr % self.n_shards
                    self._rr += 1
                    self._owner[cid] = shard
                routed.setdefault(shard, ([], []))[0].append(cid)
                routed[shard][1].append(j)
        for shard, (cids, rows) in routed.items():
            with jax.default_device(self.devices[shard]):
                self.shards[shard].upsert(cids, vectors[rows])

    def delete(self, ids: Sequence[int]) -> int:
        removed = 0
        with self._lock:
            routed: Dict[int, List[int]] = {}
            for cid in ids:
                shard = self._owner.pop(int(cid), None)
                if shard is not None:
                    routed.setdefault(shard, []).append(int(cid))
        for shard, cids in routed.items():
            with jax.default_device(self.devices[shard]):
                removed += self.shards[shard].delete(cids)
        return removed

    def search(self, queries: np.ndarray, top_k: int, *,
               nprobe: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        """Fan out to every shard, merge candidates host-side. Ties break to
        the lower shard id then shard-local order (deterministic)."""
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        b = queries.shape[0]
        if not self._owner:
            return np.zeros((b, top_k), np.int64), np.full((b, top_k), -np.inf, np.float32)

        # dispatch EVERY shard's probe program before materializing any:
        # each shard.search blocked on its own np.array pull, serializing
        # n_shards device round trips (through a tunneled chip, ~27ms
        # each); begin-all-then-collect overlaps them on hardware
        # (VERDICT r2 #6 — the encode_begin pattern)
        begun = []
        for i, (shard, dev) in enumerate(zip(self.shards, self.devices)):
            if not len(shard):
                continue
            with jax.default_device(dev):
                begun.append((i, shard.search_begin(queries, top_k, nprobe=nprobe)))

        all_ids = np.zeros((self.n_shards, b, top_k), np.int64)
        all_scores = np.full((self.n_shards, b, top_k), -np.inf, np.float32)
        for i, materialize in begun:
            all_ids[i], all_scores[i] = materialize()

        cat_ids = all_ids.transpose(1, 0, 2).reshape(b, -1)
        cat_s = all_scores.transpose(1, 0, 2).reshape(b, -1)
        order = np.argsort(-cat_s, axis=1, kind="stable")[:, :top_k]
        return (np.take_along_axis(cat_ids, order, axis=1),
                np.take_along_axis(cat_s, order, axis=1))

    def retrain(self, iters: int = 12, seed: int = 0) -> None:
        """Re-fit every shard's centroids on its own contents (corpus-drift
        refresh; /admin/compact's IVF maintenance path). Shards are
        independent programs, so each retrains on its device."""
        for i, (shard, dev) in enumerate(zip(self.shards, self.devices)):
            if not len(shard):
                continue
            with jax.default_device(dev):
                shard.retrain(iters=iters, seed=seed + i)

    # ------------------------------------------------------------- tuning

    def sample_vectors(self, n: int, seed: int = 0) -> np.ndarray:
        """Up to `n` live vectors sampled across shards (proportional to
        shard fill, so the sample matches the global distribution)."""
        total = self.count()
        parts = []
        for i, shard in enumerate(self.shards):
            if not len(shard):
                continue
            want = max(1, round(n * len(shard) / total))
            parts.append(shard.sample_vectors(want, seed=seed + i))
        out = np.concatenate(parts, axis=0) if parts else np.zeros((0, self.dim), np.float32)
        if out.shape[0] > n:
            rng = np.random.default_rng(seed)
            out = out[rng.choice(out.shape[0], size=n, replace=False)]
        return out

    def tune_nprobe(self, **kwargs) -> dict:
        """Tune the shared nprobe over the merged multi-shard search; the
        chosen value is applied to every shard (routing is round-robin, so
        all shards see the same distribution and want the same nprobe)."""
        from financial_rag_tpu.index.tuning import tune_nprobe

        return tune_nprobe(self, **kwargs)

    # ---------------------------------------------------------- persistence

    def save(self, directory) -> None:
        for shard in self.shards:
            shard.save(directory)

    @classmethod
    def load(cls, directory, n_shards: int, name: str = "children_ivf_sharded",
             **kwargs) -> "ShardedIVFIndex":
        probe = IVFIndex.load(directory, name=f"{name}_0")
        idx = cls(dim=probe.dim, n_shards=n_shards, nlist=probe.nlist,
                  list_size=probe.list_size, nprobe=probe.nprobe,
                  dtype=probe.dtype, name=name, **kwargs)
        idx.shards = [IVFIndex.load(directory, name=f"{name}_{i}")
                      for i in range(idx.n_shards)]
        for i, shard in enumerate(idx.shards):
            for cid in shard._loc_of:
                idx._owner[cid] = i
        idx._rr = len(idx._owner)
        return idx
