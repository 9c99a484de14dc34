"""Corpus-sharded flat index over a device mesh.

The multi-chip centerpiece (SURVEY.md §5.8): the child-vector corpus is
row-sharded across the mesh's 'shard' axis; a query batch is replicated;
each device runs the SAME fused top-k sweep over its local rows
(ops/topk.py); per-shard top-k candidates ride ICI via all_gather and a
tiny replicated merge yields the global top-k. Results are shard-count
invariant (ties break to the lower global index on any mesh — SURVEY.md
§7.3 'sharded top-k merge'), verified in tests by comparing 8-shard vs
1-shard results.

Slot assignment interleaves ids round-robin across shards so every device
sweeps the same number of rows (balanced HBM streams).
"""

from __future__ import annotations

import threading
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from financial_rag_tpu.ops.common import round_up
from financial_rag_tpu.ops.topk import bucketed_topk, topk_matmul, topk_matmul_reference
from financial_rag_tpu.utils import get_logger

log = get_logger("parallel.sharded_index")

TILE = 1024


def _local_search(backend: str, k: int, nbuckets: int, queries, corpus, valid):
    if backend == "pallas_bucketed":
        return bucketed_topk(queries, corpus, valid, k, nbuckets=nbuckets, interpret=False)
    if backend == "pallas_exact":
        return topk_matmul(queries, corpus, valid, k, interpret=False)
    return topk_matmul_reference(queries, corpus, valid, k)


class ShardedFlatIndex:
    """Same API as index.flat.FlatIndex, corpus sharded over mesh axis 'shard'."""

    def __init__(
        self,
        mesh: Mesh,
        dim: int = 384,
        capacity_per_shard: int = 1 << 13,
        *,
        axis: str = "shard",
        dtype=jnp.bfloat16,
        backend: str = "auto",
        nbuckets: int = 4096,
        name: str = "children_sharded",
    ) -> None:
        self.mesh = mesh
        self.axis = axis
        self.n_shards = mesh.shape[axis]
        self.dim = dim
        self.cap_per_shard = round_up(capacity_per_shard, TILE)
        self.capacity = self.cap_per_shard * self.n_shards
        self.dtype = dtype
        self.name = name
        self.nbuckets = nbuckets
        if backend == "auto":
            backend = "pallas_bucketed" if jax.default_backend() == "tpu" else "xla"
        self.backend = backend

        self._row_sharding = NamedSharding(mesh, P(axis, None))
        self._valid_sharding = NamedSharding(mesh, P(axis))
        self._vectors = jax.device_put(
            jnp.zeros((self.capacity, dim), dtype), self._row_sharding)
        self._valid = jax.device_put(
            jnp.zeros((self.capacity,), jnp.float32), self._valid_sharding)
        self._ids = np.zeros((self.capacity,), np.int64)
        self._slot_of: Dict[int, int] = {}
        self._fill = np.zeros(self.n_shards, np.int64)  # next local slot per shard
        self._lock = threading.Lock()
        self._search_fn: Dict[Tuple, object] = {}

    def __len__(self) -> int:
        return len(self._slot_of)

    def count(self) -> int:
        return len(self._slot_of)

    # ------------------------------------------------------------- updates

    def _alloc_slot(self) -> int:
        """Round-robin across shards: global slot = shard*cap + local.
        When every shard is full, capacity doubles (per shard) so a
        long-running deployment never hard-stops at initial capacity."""
        shard = int(np.argmin(self._fill))
        if self._fill[shard] >= self.cap_per_shard:
            self._grow()
            shard = int(np.argmin(self._fill))
        local = int(self._fill[shard])
        self._fill[shard] += 1
        return shard * self.cap_per_shard + local

    def _grow(self) -> None:
        """Double capacity_per_shard. Global slot numbering is
        shard*cap + local, so growth remaps every existing slot; the device
        arrays round-trip through host once (fine at doubling cadence)."""
        old_cap, new_cap = self.cap_per_shard, self.cap_per_shard * 2
        log.info("growing sharded index %s: %d -> %d slots/shard",
                 self.name, old_cap, new_cap)
        host_vec = np.asarray(self._vectors).reshape(self.n_shards, old_cap, self.dim)
        host_val = np.asarray(self._valid).reshape(self.n_shards, old_cap)
        pad = new_cap - old_cap
        host_vec = np.pad(host_vec, ((0, 0), (0, pad), (0, 0)))
        host_val = np.pad(host_val, ((0, 0), (0, pad)))
        new_ids = np.zeros(self.n_shards * new_cap, np.int64)
        remap = {}
        for cid, slot in self._slot_of.items():
            shard, local = divmod(slot, old_cap)
            ns = shard * new_cap + local
            remap[cid] = ns
            new_ids[ns] = cid
        self._slot_of = remap
        # REPLACE (never mutate in place): searches resolve ids through a
        # snapshotted reference taken under the lock — the old array must
        # keep the old slot numbering for their in-flight resolutions
        self._ids = new_ids
        self.cap_per_shard = new_cap
        self.capacity = new_cap * self.n_shards
        self._vectors = jax.device_put(
            jnp.asarray(host_vec.reshape(self.capacity, self.dim)), self._row_sharding)
        self._valid = jax.device_put(
            jnp.asarray(host_val.reshape(self.capacity)), self._valid_sharding)
        self._search_fn.clear()  # local corpus shape changed

    def upsert(self, ids, vectors: np.ndarray) -> None:
        from financial_rag_tpu.index.persist import encode_payload

        vectors = np.asarray(vectors, np.float32)
        vectors = vectors / np.maximum(np.linalg.norm(vectors, axis=1, keepdims=True), 1e-12)
        with self._lock:
            slots = np.empty(len(ids), np.int64)
            for j, cid in enumerate(ids):
                cid = int(cid)
                slot = self._slot_of.get(cid)
                if slot is None:
                    slot = self._alloc_slot()
                    self._slot_of[cid] = slot
                    self._ids[slot] = cid
                slots[j] = slot
            slots_d = jnp.asarray(slots)
            payload, weights = encode_payload(vectors, self.dtype)
            self._vectors = jax.device_put(
                self._vectors.at[slots_d].set(payload), self._row_sharding)
            # validity doubles as the per-row dequantization weight
            # (1.0 for float dtypes, max|v|/127 for int8)
            self._valid = jax.device_put(
                self._valid.at[slots_d].set(jnp.asarray(weights)),
                self._valid_sharding)

    def delete(self, ids) -> int:
        with self._lock:
            slots = [self._slot_of.pop(int(c)) for c in ids if int(c) in self._slot_of]
            for s in slots:
                self._ids[s] = 0
            if slots:
                self._valid = jax.device_put(
                    self._valid.at[jnp.asarray(np.asarray(slots))].set(0.0),
                    self._valid_sharding)
            return len(slots)

    # -------------------------------------------------------------- search

    def _build_search(self, k: int):
        from jax import shard_map

        cap, axis, backend, nbuckets = self.cap_per_shard, self.axis, self.backend, self.nbuckets

        def shard_fn(queries, corpus, valid):
            # local shapes: queries [B, D] (replicated), corpus [cap, D], valid [cap]
            s, i = _local_search(backend, k, nbuckets, queries, corpus, valid)
            shard_id = jax.lax.axis_index(axis)
            gi = jnp.where(i >= 0, i + shard_id * cap, -1)
            # gather per-shard candidates: [n_shards, B, k]
            s_all = jax.lax.all_gather(s, axis)
            i_all = jax.lax.all_gather(gi, axis)
            b = s.shape[0]
            s_cat = jnp.swapaxes(s_all, 0, 1).reshape(b, -1)   # [B, n_shards*k]
            i_cat = jnp.swapaxes(i_all, 0, 1).reshape(b, -1)
            # shard-major concat + stable top_k => ties favor lower shard,
            # and within a shard candidates are already in lower-index-first
            # rank order, so the merge is globally tie-consistent
            top_s, pos = jax.lax.top_k(s_cat, k)
            top_i = jnp.take_along_axis(i_cat, pos, axis=1)
            return top_s, top_i

        fn = shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(P(), P(self.axis, None), P(self.axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    # ---------------------------------------------------------- persistence

    def save(self, directory) -> None:
        """Persist shard contents to host storage (npz + manifest); the
        array gathers to host once — fine for checkpointing cadence."""
        from pathlib import Path

        from financial_rag_tpu.index.persist import (
            atomic_savez, atomic_write_json, dtype_name)

        d = Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        # snapshot REFERENCES under the lock (a concurrent upsert/_grow
        # would otherwise checkpoint ids and vectors from different epochs
        # — post-grow numbering against pre-grow rows), but materialize the
        # multi-GB device->host gather OUTSIDE it: sharded updates are
        # non-donated copy-on-write (upsert/delete/_grow replace the array
        # objects), so the snapshot stays valid and searches/upserts aren't
        # stalled behind the transfer
        with self._lock:
            vectors_d, valid_d = self._vectors, self._valid
            ids_h = self._ids.copy()
            fill_h = self._fill.copy()
            cap = self.cap_per_shard
            n = self.count()
        vectors_h = np.asarray(vectors_d, np.float32)
        valid_h = np.asarray(valid_d)
        atomic_savez(
            d / f"{self.name}.npz",
            vectors=vectors_h,
            valid=valid_h,
            ids=ids_h,
            fill=fill_h,
        )
        atomic_write_json(d / f"{self.name}.manifest.json", {
            "name": self.name, "dim": self.dim, "n_shards": self.n_shards,
            "cap_per_shard": cap, "count": n,
            "dtype": dtype_name(self.dtype),
        })

    @classmethod
    def load(cls, directory, mesh: Mesh, name: str = "children_sharded",
             **kwargs) -> "ShardedFlatIndex":
        """Reload onto a (possibly different-size) mesh by replaying live
        rows through upsert, so slot balancing stays valid. Also accepts a
        single-device FlatIndex checkpoint of the same name (manifest
        without `cap_per_shard`) — a deployment can switch INDEX_SHARDS on
        and keep its corpus."""
        import json
        from pathlib import Path

        from financial_rag_tpu.index.persist import STR_TO_DTYPE, decode_payload
        from financial_rag_tpu.ops.common import round_up

        d = Path(directory)
        manifest = json.loads((d / f"{name}.manifest.json").read_text())
        data = np.load(d / f"{name}.npz")
        valid, ids, vectors = data["valid"], data["ids"], data["vectors"]
        saved_dtype = manifest.get("dtype")
        if "dtype" not in kwargs and saved_dtype in STR_TO_DTYPE:
            kwargs["dtype"] = STR_TO_DTYPE[saved_dtype]
        n_shards = mesh.shape[kwargs.get("axis", "shard")]
        cap = manifest.get("cap_per_shard") or round_up(
            max(int((valid > 0).sum()) // max(n_shards, 1) * 2, TILE), TILE)
        idx = cls(mesh, dim=manifest["dim"], capacity_per_shard=cap,
                  name=name, **kwargs)
        live = np.nonzero(valid > 0)[0]
        if len(live):
            idx.upsert(ids[live], decode_payload(vectors[live], saved_dtype,
                                                 weights=valid[live]))
        return idx

    def search(self, queries: np.ndarray, top_k: int) -> Tuple[np.ndarray, np.ndarray]:
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        b = queries.shape[0]
        if not self._slot_of:
            return np.zeros((b, top_k), np.int64), np.full((b, top_k), -np.inf, np.float32)

        # snapshot EVERYTHING under the lock: _grow() renumbers every slot
        # and replaces the _ids ARRAY OBJECT, so resolving through the
        # snapshotted reference stays consistent with the snapshotted
        # vectors no matter what lands afterwards. (In-place mutations of
        # the snapshot are benign: delete zeroes an id -> filtered; an
        # upsert's fresh slot has valid=0 in the vectors snapshot -> its
        # score is already filtered.) Snapshotting vectors/valid as a pair
        # also keeps payload and dequantization weights matched across an
        # in-flight upsert.
        with self._lock:
            vectors, valid, ids_host = self._vectors, self._valid, self._ids
            fn = self._search_fn.get(top_k)
            if fn is None:
                fn = self._build_search(top_k)
                self._search_fn[top_k] = fn
        with self.mesh:
            s, gi = fn(jnp.asarray(queries), vectors, valid)
        s, gi = np.array(s), np.array(gi)
        ids = np.where(gi >= 0, ids_host[np.maximum(gi, 0)], 0)
        bad = s < -100.0
        ids[bad] = 0
        s[bad] = -np.inf
        return ids.astype(np.int64), s
