"""HBM-resident flat cosine index.

TPU-native replacement for the reference's Chroma/hnswlib child vector store
(reference chroma_child_store.py:36-80, API: upsert_children / search /
count). Design:

- vectors live on-device as one preallocated [capacity, D] bf16 matrix plus
  a [capacity] validity mask; search is a single fused Pallas sweep
  (ops/topk.py) so no ANN graph, no host round-trips, exact-or-near-exact
  results at memory speed-of-light;
- ids are host-side: slot -> child_id array and child_id -> slot dict
  (payload metadata lives in store/child_meta.py, not in the index);
- upserts buffer on host and flush to the device in one scatter, doubling
  capacity as needed (capacity stays a multiple of the kernel tile so
  shapes are static and compiles are cached);
- persistence is an .npz of vectors + ids with a JSON manifest
  (SURVEY.md §5.4 'index manifest + shard checkpoints').
"""

from __future__ import annotations

import json
import threading
from functools import partial
from pathlib import Path
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from financial_rag_tpu.ops.common import round_up
from financial_rag_tpu.ops.topk import (
    bucketed_topk,
    bucketed_topk_fused,
    packed_topk_fused,
    topk_matmul,
    topk_matmul_reference,
)
from financial_rag_tpu.utils import get_logger

log = get_logger("index.flat")

TILE = 1024  # kernel corpus tile; capacity is always a multiple


@partial(jax.jit, donate_argnums=(0, 1))
def _donated_scatter(vectors, valid, slots, payload, weights):
    """In-place index update: donating the storage buffers lets XLA write
    into them directly instead of materializing a second copy — peak HBM
    stays at 1x storage during ingest (see ROADMAP '10M single-chip')."""
    # validity doubles as the per-row dequantization weight (1.0 for
    # float dtypes, max|v|/127 for int8 — see ops/topk._weighted_mask)
    return vectors.at[slots].set(payload), valid.at[slots].set(weights)


@partial(jax.jit, static_argnames=("dtype_name",))
def _encode_payload_device(v, dtype_name: str):
    """On-device normalize + storage encode: the ingest path hands encoder
    outputs straight to the index without a device->host->device round trip
    (2x the corpus bytes through the tunnel per document, and the host wait
    serialized the whole pipeline). Mirrors persist.encode_payload."""
    from financial_rag_tpu.ops.topk import INT8_SCALE

    v = v.astype(jnp.float32)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    if dtype_name == "int8":
        m = jnp.maximum(jnp.abs(v).max(axis=1), 1e-12)
        q = jnp.clip(jnp.round(v * (INT8_SCALE / m[:, None])), -127, 127).astype(jnp.int8)
        return q, (m / INT8_SCALE).astype(jnp.float32)
    return v.astype(dtype_name), jnp.ones(v.shape[0], jnp.float32)


class FlatIndex:
    """Exact / near-exact cosine top-k over an HBM-resident corpus."""

    def __init__(
        self,
        dim: int = 384,
        capacity: int = 1 << 14,
        *,
        dtype=jnp.bfloat16,
        backend: str = "auto",   # auto | pallas_bucketed | pallas_exact | xla
        nbuckets: int = 4096,
        name: str = "children",
    ) -> None:
        self.dim = dim
        self.capacity = round_up(capacity, TILE)
        self.dtype = dtype
        self.name = name
        self.nbuckets = nbuckets
        if backend == "auto":
            backend = "pallas_fused" if jax.default_backend() == "tpu" else "xla"
        self.backend = backend

        self._vectors = jnp.zeros((self.capacity, dim), dtype)
        self._valid = jnp.zeros((self.capacity,), jnp.float32)
        self._ids = np.zeros((self.capacity,), np.int64)
        self._slot_of: Dict[int, int] = {}
        self._next_slot = 0
        self._lock = threading.Lock()
        self._search_fns: Dict[Tuple, object] = {}

    # ------------------------------------------------------------------ API

    def __len__(self) -> int:
        return len(self._slot_of)

    def count(self) -> int:
        return len(self._slot_of)

    # class flag (not hasattr — wrappers delegate attribute lookups): the
    # ingest pipeline hands device-resident encoder outputs straight to
    # upsert(), skipping the device->host->device round trip
    supports_device_upsert = True

    def upsert(self, ids: Sequence[int], vectors) -> None:
        """Insert or overwrite vectors. ids: int64 child ids, vectors [N, D]
        host numpy OR device jax.Array (L2-normalized by the encoder;
        normalized again on the storage path defensively)."""
        on_device = isinstance(vectors, jax.Array)
        if not on_device:
            vectors = np.asarray(vectors, np.float32)
            norms = np.linalg.norm(vectors, axis=1, keepdims=True)
            vectors = vectors / np.maximum(norms, 1e-12)
        assert vectors.ndim == 2 and vectors.shape[1] == self.dim, vectors.shape
        assert len(ids) == vectors.shape[0]

        with self._lock:
            slots = np.empty(len(ids), np.int32)
            for j, cid in enumerate(ids):
                cid = int(cid)
                slot = self._slot_of.get(cid)
                if slot is None:
                    slot = self._next_slot
                    self._next_slot += 1
                    if slot >= self.capacity:
                        self._grow()
                    self._slot_of[cid] = slot
                    self._ids[slot] = cid
                slots[j] = slot
            self._scatter(slots, vectors, valid=1.0, on_device=on_device)

    def delete(self, ids: Sequence[int]) -> int:
        """Invalidate ids; returns number removed. Slots are not reused
        (tombstoned) until a rebuild/compact."""
        with self._lock:
            slots = []
            for cid in ids:
                slot = self._slot_of.pop(int(cid), None)
                if slot is not None:
                    slots.append(slot)
                    self._ids[slot] = 0
            if slots:
                slots_a = np.asarray(slots, np.int32)
                self._valid = self._valid.at[slots_a].set(0.0)
            return len(slots)

    def compact(self) -> int:
        """Rebuild the index dropping tombstoned slots; returns slots
        reclaimed. Changes slot assignment (ids are stable)."""
        with self._lock:
            live = [(cid, slot) for cid, slot in self._slot_of.items()]
            reclaimed = self._next_slot - len(live)
            if reclaimed <= 0:
                return 0
            live.sort(key=lambda cs: cs[1])  # preserve insertion order
            old_slots = jnp.asarray(np.asarray([s for _, s in live], np.int32))
            vectors = self._vectors[old_slots] if live else self._vectors[:0]
            weights = self._valid[old_slots] if live else self._valid[:0]

            self._vectors = jnp.zeros((self.capacity, self.dim), self.dtype)
            self._valid = jnp.zeros((self.capacity,), jnp.float32)
            # REPLACE (never renumber in place): deferred materializers
            # resolve ids through a reference snapshotted at dispatch — the
            # old array must keep the old numbering for them
            self._ids = np.zeros((self.capacity,), np.int64)
            self._slot_of = {}
            for new_slot, (cid, _) in enumerate(live):
                self._slot_of[cid] = new_slot
                self._ids[new_slot] = cid
            self._next_slot = len(live)
            if live:
                idxs = jnp.arange(len(live))
                self._vectors = self._vectors.at[idxs].set(vectors)
                # carry each row's dequantization weight with it
                self._valid = self._valid.at[idxs].set(weights)
            log.info("compacted index %s: reclaimed %d slots", self.name, reclaimed)
            return reclaimed

    # class-level flags (not hasattr): delegating wrappers (BatchingIndex)
    # forward attribute lookups, so hasattr would lie through them
    supports_search_begin = True
    # search_begin takes jax.Array queries without a host round trip — a
    # chained encoder output feeds the sweep directly (retrieval/hybrid.py)
    accepts_device_queries = True

    def search_begin(self, queries: np.ndarray, top_k: int):
        """Dispatch a batched search WITHOUT materializing: returns a
        :class:`SearchPending` whose ``get()`` (or ``pending.collect`` over
        several indexes) pulls (child_ids [B, k] int64, scores [B, k] f32)
        in ONE device transfer. Through a tunneled chip each host pull is a
        full RPC round trip, so the dual-index query path goes 4 round
        trips -> 1 (see index/pending.py).

        ``queries`` may be a host array or an already-on-device [B, D]
        array (e.g. a pending encoder output chained without a host
        round trip)."""
        from financial_rag_tpu.index.pending import SearchPending, ready

        is_device = isinstance(queries, jax.Array)
        if not is_device:
            queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        b = queries.shape[0]
        if not self._slot_of:
            return ready(np.zeros((b, top_k), np.int64),
                         np.full((b, top_k), -np.inf, np.float32))

        # under the lock: a donated in-place upsert invalidates the old
        # storage buffer, so a search racing it could dispatch a deleted
        # array (pre-donation it merely read stale data). The _ids
        # REFERENCE is snapshotted with the dispatch: compact() replaces
        # the array object when it renumbers slots, so a deferred
        # materializer resolving through this snapshot always uses the
        # numbering its scores were computed under. (In-place mutations of
        # the snapshot are benign: delete zeroes an id -> filtered; an
        # upsert's fresh slot was scored invalid in the dispatched
        # storage.)
        with self._lock:
            ids_host = self._ids
            scores, slots = self._dispatch(
                queries if is_device else jnp.asarray(queries), top_k)

        def finish(host):
            scores_h, slots_h = host
            scores_h = np.asarray(scores_h)
            slots_h = np.asarray(slots_h)
            ids = np.where(slots_h >= 0, ids_host[np.maximum(slots_h, 0)], 0)
            bad = scores_h < -100.0
            ids[bad] = 0
            scores_h = scores_h.copy()
            scores_h[bad] = -np.inf
            return ids.astype(np.int64), scores_h

        return SearchPending((scores, slots), finish)

    def search(self, queries: np.ndarray, top_k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Batched search. queries [B, D] -> (child_ids [B, k] int64,
        scores [B, k] f32). Empty slots never surface (score < -100 filtered
        to id 0 / score -inf)."""
        return self.search_begin(queries, top_k).get()

    # ------------------------------------------------------------ internals

    def _scatter(self, slots: np.ndarray, vectors, valid: float,
                 on_device: bool = False) -> None:
        from financial_rag_tpu.index.persist import (
            dtype_name, encode_payload, pad_pow2)

        if not len(slots):  # empty ingest batch (document with no children)
            return
        if on_device:
            payload, weights = _encode_payload_device(vectors, dtype_name(self.dtype))
            if valid != 1.0:
                weights = weights * valid
        else:
            payload, weights = encode_payload(vectors, self.dtype)
            weights = jnp.asarray(weights * valid)
        # donated scatter: without donation the .at[].set copy-on-write
        # doubles peak HBM during ingest (fatal at 10M-chunk scale — the
        # corpus alone is half of a v5e's 16GB)
        slots, payload, weights = pad_pow2(slots, payload, weights)
        self._vectors, self._valid = _donated_scatter(
            self._vectors, self._valid, jnp.asarray(slots), payload, weights)

    def _grow(self) -> None:
        new_cap = self.capacity * 2
        log.info("growing index %s: %d -> %d slots", self.name, self.capacity, new_cap)
        self._vectors = jnp.concatenate(
            [self._vectors, jnp.zeros((new_cap - self.capacity, self.dim), self.dtype)])
        self._valid = jnp.concatenate(
            [self._valid, jnp.zeros((new_cap - self.capacity,), jnp.float32)])
        self._ids = np.concatenate([self._ids, np.zeros(new_cap - self.capacity, np.int64)])
        self.capacity = new_cap
        self._search_fns.clear()

    def _dispatch(self, queries: jnp.ndarray, k: int):
        key = (self.backend, self.capacity, k)
        fn = self._search_fns.get(key)
        if fn is None:
            if self.backend == "pallas_fused":
                if self.dtype == jnp.int8:
                    # int8 needs the per-row dequant weight inside the dot
                    raw = partial(bucketed_topk_fused, k=k,
                                  nbuckets=self.nbuckets, interpret=False)
                else:
                    # float corpora take the packed kernel: 1.17x faster
                    # with HIGHER recall (ops/topk.packed_topk_fused)
                    raw = partial(packed_topk_fused, k=k, interpret=False)
            elif self.backend == "pallas_bucketed":
                raw = partial(bucketed_topk, k=k, nbuckets=self.nbuckets, interpret=False)
            elif self.backend == "pallas_exact":
                raw = partial(topk_matmul, k=k, interpret=False)
            elif self.backend == "xla":
                raw = partial(topk_matmul_reference, k=k)
            else:
                raise ValueError(f"unknown backend {self.backend}")
            fn = jax.jit(lambda q, x, v: raw(q, x, v))
            self._search_fns[key] = fn
        return fn(queries, self._vectors, self._valid)

    # ---------------------------------------------------------- persistence

    def save(self, directory: str | Path) -> None:
        from financial_rag_tpu.index.persist import (
            atomic_savez, atomic_write_json, dtype_name)

        d = Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        # snapshot under the lock: a donated upsert racing the device->host
        # pull would invalidate the buffer mid-read
        with self._lock:
            used = self._next_slot
            vectors_h = np.asarray(self._vectors[:used], np.float32)
            valid_h = np.asarray(self._valid[:used])
            ids_h = self._ids[:used].copy()
        # int8 payloads persist as their raw quantized values (cast to f32
        # in the npz); the manifest dtype tells load() how to decode them.
        atomic_savez(
            d / f"{self.name}.npz",
            vectors=vectors_h,
            valid=valid_h,
            ids=ids_h,
        )
        atomic_write_json(d / f"{self.name}.manifest.json", {
            "name": self.name,
            "dim": self.dim,
            "count": self.count(),
            "used_slots": used,
            "backend": self.backend,
            "nbuckets": self.nbuckets,
            "dtype": dtype_name(self.dtype),
        })

    @classmethod
    def load(cls, directory: str | Path, name: str = "children", **kwargs) -> "FlatIndex":
        """Reload. Storage dtype / nbuckets come from the manifest unless the
        caller overrides them; int8 payloads are rescaled into unit-vector
        space first so a dtype change between save and load re-quantizes
        correctly instead of reinterpreting ±127 values. `backend` is NOT
        taken from the manifest: it is environment-dependent (pallas on TPU,
        xla on CPU) and re-resolved by the constructor's "auto"."""
        from financial_rag_tpu.index.persist import (
            STR_TO_DTYPE, decode_payload, encode_payload)

        d = Path(directory)
        data = np.load(d / f"{name}.npz")
        vectors, valid, ids = data["vectors"], data["valid"], data["ids"]
        manifest_path = d / f"{name}.manifest.json"
        manifest = json.loads(manifest_path.read_text()) if manifest_path.exists() else {}
        saved_dtype = manifest.get("dtype")
        if "dtype" not in kwargs and saved_dtype in STR_TO_DTYPE:
            kwargs["dtype"] = STR_TO_DTYPE[saved_dtype]
        if "nbuckets" not in kwargs and "nbuckets" in manifest:
            kwargs["nbuckets"] = manifest["nbuckets"]
        used = vectors.shape[0]
        dim = vectors.shape[1] if used else kwargs.pop("dim", 384)
        kwargs.pop("dim", None)  # saved dim wins over a caller-provided one
        idx = cls(dim=dim, capacity=max(used, TILE), name=name, **kwargs)
        if used:
            unit = decode_payload(vectors, saved_dtype, weights=valid)
            payload, weights = encode_payload(unit, idx.dtype)
            idx._vectors = idx._vectors.at[:used].set(payload)
            # re-encoded weights for live slots; tombstones stay 0
            idx._valid = idx._valid.at[:used].set(
                jnp.asarray(np.where(valid > 0, weights, 0.0).astype(np.float32)))
            idx._ids[:used] = ids
            idx._next_slot = used
            idx._slot_of = {int(cid): s for s, cid in enumerate(ids) if valid[s] > 0}
        return idx
