"""Multi-vector (late-interaction / ColBERT-style) index.

Capability of reference parent_child/multivector_store.py:111-187 — but
where the reference approximates MaxSim by per-query-token HNSW lookups
(top-10 token neighbors only), this index computes EXACT MaxSim over all
children in one batched device sweep:

    sims[c, q, t] = q_vec[q] . child_tokens[c, t]
    score[c]      = sum_q max_t sims[c, q, t]

Token storage is a dense [capacity, T_child, D] bf16 block with a token
mask, scanned in fixed-size child chunks with a running top-k — the same
streaming pattern as the flat index. Disabled by default, matching the
reference (pipeline mv_enabled=False / CHILD_USE_MULTIVECTOR gate).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from financial_rag_tpu.ops.common import round_up
from financial_rag_tpu.utils import get_logger

log = get_logger("index.multivector")

NEG = -3.0e4


class MultiVectorIndex:
    def __init__(
        self,
        dim: int = 384,
        max_child_tokens: int = 128,
        capacity: int = 4096,
        *,
        dtype=jnp.bfloat16,
        chunk: int = 256,
        name: str = "children_multivector",
    ) -> None:
        self.dim = dim
        self.max_child_tokens = max_child_tokens
        self.capacity = round_up(capacity, chunk)
        self.chunk = chunk
        self.dtype = dtype
        self.name = name

        self._tokens = jnp.zeros((self.capacity, max_child_tokens, dim), dtype)
        self._tok_mask = jnp.zeros((self.capacity, max_child_tokens), jnp.float32)
        self._valid = jnp.zeros((self.capacity,), jnp.float32)
        self._ids = np.zeros((self.capacity,), np.int64)
        self._slot_of: Dict[int, int] = {}
        self._next_slot = 0
        self._lock = threading.Lock()
        self._search_fn = None

    def __len__(self) -> int:
        return len(self._slot_of)

    def count(self) -> int:
        return len(self._slot_of)

    def upsert(self, child_ids: Sequence[int], token_vecs: Sequence[np.ndarray]) -> None:
        """token_vecs[i]: [t_i, D] L2-normalized token embeddings (CLS/SEP
        already dropped by the token encoder)."""
        with self._lock:
            slots = []
            toks = np.zeros((len(child_ids), self.max_child_tokens, self.dim), np.float32)
            masks = np.zeros((len(child_ids), self.max_child_tokens), np.float32)
            for j, (cid, tv) in enumerate(zip(child_ids, token_vecs)):
                cid = int(cid)
                slot = self._slot_of.get(cid)
                if slot is None:
                    slot = self._next_slot
                    self._next_slot += 1
                    if slot >= self.capacity:
                        self._grow()
                    self._slot_of[cid] = slot
                    self._ids[slot] = cid
                slots.append(slot)
                tv = np.asarray(tv, np.float32)[: self.max_child_tokens]
                tv = tv / np.maximum(np.linalg.norm(tv, axis=1, keepdims=True), 1e-12)
                toks[j, : len(tv)] = tv
                masks[j, : len(tv)] = 1.0
            slots_d = jnp.asarray(np.asarray(slots, np.int32))
            self._tokens = self._tokens.at[slots_d].set(jnp.asarray(toks, self.dtype))
            self._tok_mask = self._tok_mask.at[slots_d].set(jnp.asarray(masks))
            self._valid = self._valid.at[slots_d].set(1.0)

    def delete(self, child_ids: Sequence[int]) -> int:
        with self._lock:
            slots = []
            for cid in child_ids:
                slot = self._slot_of.pop(int(cid), None)
                if slot is not None:
                    slots.append(slot)
                    self._ids[slot] = 0
            if slots:
                self._valid = self._valid.at[
                    jnp.asarray(np.asarray(slots, np.int32))].set(0.0)
            return len(slots)

    def _grow(self) -> None:
        pad = self.capacity
        self._tokens = jnp.concatenate(
            [self._tokens, jnp.zeros((pad, self.max_child_tokens, self.dim), self.dtype)])
        self._tok_mask = jnp.concatenate(
            [self._tok_mask, jnp.zeros((pad, self.max_child_tokens), jnp.float32)])
        self._valid = jnp.concatenate([self._valid, jnp.zeros((pad,), jnp.float32)])
        self._ids = np.concatenate([self._ids, np.zeros(pad, np.int64)])
        self.capacity *= 2
        self._search_fn = None

    def _build_search(self, k: int, tq: int):
        # token storage rides as jit ARGUMENTS (not closure constants): no
        # recompile per upsert, mutations immediately visible, and no
        # giant-constant compile payloads (tests/test_index_mutation.py)
        chunk = self.chunk
        n_chunks = self.capacity // chunk
        mct, dim = self.max_child_tokens, self.dim

        @jax.jit
        def run(qv, tokens_flat, tok_mask_flat, valid_flat):  # qv: [Tq, D] f32
            tokens = tokens_flat.reshape(n_chunks, chunk, mct, dim)
            tok_mask = tok_mask_flat.reshape(n_chunks, chunk, mct)
            valid = valid_flat.reshape(n_chunks, chunk)
            q = qv.astype(tokens.dtype)

            def step(carry, inp):
                run_s, run_i = carry
                toks, tmask, v, j = inp
                sims = jnp.einsum("qd,ctd->cqt", q, toks,
                                  preferred_element_type=jnp.float32)
                sims = sims + (tmask[:, None, :] - 1.0) * 1.0e5
                maxsim = jnp.max(sims, axis=2)                    # [C, Tq]
                score = jnp.sum(maxsim, axis=1)                   # [C]
                score = score + (v - 1.0) * 1.0e5
                idx = jnp.arange(chunk, dtype=jnp.int32) + j * chunk
                cand_s = jnp.concatenate([run_s, score])
                cand_i = jnp.concatenate([run_i, idx])
                top_s, pos = jax.lax.top_k(cand_s, k)
                return (top_s, jnp.take(cand_i, pos)), None

            init = (jnp.full((k,), NEG, jnp.float32), jnp.full((k,), -1, jnp.int32))
            js = jnp.arange(n_chunks, dtype=jnp.int32)
            (s, i), _ = jax.lax.scan(step, init, (tokens, tok_mask, valid, js))
            return s, i

        return run

    def search_aggregate(self, query_token_vecs: np.ndarray, top_k: int = 24) -> List[dict]:
        """Exact MaxSim search. query_token_vecs: [Tq, D]. Returns
        [{score, child_id}, ...] best-first."""
        if not self._slot_of:
            return []
        qv = np.asarray(query_token_vecs, np.float32)
        qv = qv / np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-12)

        key = (top_k, qv.shape[0], self.capacity)
        if self._search_fn is None or self._search_fn[0] != key:
            self._search_fn = (key, self._build_search(top_k, qv.shape[0]))
        s, i = self._search_fn[1](jnp.asarray(qv), self._tokens,
                                  self._tok_mask, self._valid)
        s, i = np.array(s), np.array(i)
        out = []
        for score, slot in zip(s, i):
            if slot < 0 or score < -100.0:
                continue
            out.append({"score": float(score), "child_id": int(self._ids[slot])})
        return out
