"""Hybrid child retrieval: multi-query x dual-encoder dense + BM25 sparse.

The reference's hot loop runs 6 sequential encode+HNSW searches per request
(reference rag_backend.py:674-714); here the 3 query variants are encoded
as ONE batch per encoder and searched as ONE fused device sweep per index,
then fused exactly like the reference (rag_backend.py:722-795):

  dense  = RRF(k=60) or min-max-avg over the (query x encoder) ranked lists
  sparse = BM25Okapi over candidate snippets(+contexts), max over queries
  final  = dense + sparse / n_candidates ; top max_children

Also reproduces the inline hit@k diagnostic (rag_backend.py:800-819).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from financial_rag_tpu.config import FusionConfig, RetrievalConfig
from financial_rag_tpu.index.flat import FlatIndex
from financial_rag_tpu.llm.provider import LLMProvider, NullLLM, normalize_query
from financial_rag_tpu.models.encoder import DualEncoder
from financial_rag_tpu.retrieval.bm25 import build_scorer
from financial_rag_tpu.retrieval.fusion import minmax_avg_fuse, rrf_fuse
from financial_rag_tpu.store import ChildMetaStore
from financial_rag_tpu.utils import get_logger, time_block

log = get_logger("retrieval.hybrid")


def chained_dense_search(dual_encoder, indexes: Dict[str, FlatIndex],
                         queries: List[str], top_k: int, *,
                         timer_prefix: str = "dense"):
    """Per-model dense sweeps with the encoder output chained on device;
    returns ``[(ids [B, k], scores [B, k])]`` in encoder order.

    A request's floor through a tunneled chip is its HOST MATERIALIZATION
    count: the encode-then-search shape pays two encoder pulls plus one
    sweep collect (~3 serialized RPCs). When every index accepts jax.Array
    queries (FlatIndex.accepts_device_queries), the encoder forwards
    dispatch device-out, their [N, D] outputs feed the sweep dispatches
    without crossing the host boundary, and the sweep results AND the
    query vectors (to fill the md5 embedding cache) come back in ONE
    combined device_get — 3 round trips -> 1. Indexes without device-query
    support (IVF assigns probes host-side) keep the host handoff; a full
    cache hit skips the encode entirely. Shared by the hybrid raw lane and
    the dense-only retriever (reference retriever.py:80-107 semantics)."""
    import jax

    from financial_rag_tpu.index.pending import collect, ready

    de = dual_encoder
    cached = de.cached_all(queries)
    chain = cached is None and all(
        getattr(type(idx), "accepts_device_queries", False)
        for idx in indexes.values())
    if cached is not None:
        handles: Dict[str, object] = cached
    elif chain:
        with time_block(f"{timer_prefix}.encode"):
            # dispatch-only: device-out materializers run an on-device
            # gather (encoders lacking the split return host arrays —
            # both are fine below)
            begun = de.encode_all_begin(queries, device_out=True)
            handles = {n: (m() if callable(m) else m) for n, m in begun.items()}
    else:
        with time_block(f"{timer_prefix}.encode"):
            handles = de.encode_all(queries, use_cache=True)

    pendings = []
    for name, vecs in handles.items():
        idx = indexes[name]
        if getattr(type(idx), "supports_search_begin", False):
            pendings.append(idx.search_begin(vecs, top_k))
        else:
            # index without the dispatch/materialize split: blocking call
            pendings.append(ready(*idx.search(np.asarray(vecs), top_k)))

    with time_block(f"{timer_prefix}.search"):
        if chain and de.cache is not None:
            dev = [n for n, v in handles.items() if isinstance(v, jax.Array)]
            results, vec_host = collect(pendings, extra=[handles[n] for n in dev])
            for name, hv in zip(dev, vec_host):
                arr = np.asarray(hv, np.float32)
                for i, t in enumerate(queries):
                    de.cache.put(name, t, arr[i])
            for name, v in handles.items():
                if name not in dev:  # host-side encoder output
                    arr = np.asarray(v, np.float32)
                    for i, t in enumerate(queries):
                        de.cache.put(name, t, arr[i])
        else:
            results = collect(pendings)
    return results


class HybridRetriever:
    def __init__(
        self,
        dual_encoder: DualEncoder,
        indexes: Dict[str, FlatIndex],
        child_meta: ChildMetaStore,
        *,
        fusion_cfg: Optional[FusionConfig] = None,
        retrieval_cfg: Optional[RetrievalConfig] = None,
        llm: Optional[LLMProvider] = None,
        multivector_index=None,
        token_encoder=None,
        sweep_batcher=None,
    ) -> None:
        self.dual_encoder = dual_encoder
        self.indexes = indexes
        self.child_meta = child_meta
        self.fusion_cfg = fusion_cfg or FusionConfig()
        self.retrieval_cfg = retrieval_cfg or RetrievalConfig()
        self.llm = llm or NullLLM()
        # optional late-interaction tier (reference rag_backend.py:652-672,
        # gated by CHILD_USE_MULTIVECTOR -> retrieval_cfg.multivector_enabled)
        self.multivector_index = multivector_index
        self.token_encoder = token_encoder
        # cross-request micro-batching of the dual sweep (serving/batcher.py
        # MultiIndexBatcher): concurrent requests' per-model sweeps coalesce
        # into ONE fused device round trip
        self.sweep_batcher = sweep_batcher

    def retrieve_children(
        self,
        question: str,
        max_children: Optional[int] = None,
    ) -> Tuple[List[dict], Dict[int, int], List[str]]:
        """Returns (child_chunks sorted by hybrid score, child->parent map,
        query variants used)."""
        max_children = max_children or self.fusion_cfg.candidates
        queries = normalize_query(self.llm, question)

        # ---- dense: batch the query variants per encoder, one sweep per index.
        # Above the direct concurrency limit requests coalesce across the
        # batcher (serving/batcher.py): preferably as device-CHAINED waves
        # (texts in, one combined device_get out — search_texts), falling
        # back to two-phase waves (host encode wave, then sweep wave) when
        # an index/encoder can't chain; at or below the limit the raw lane
        # chains per request (_dense_results_chained).
        use_batcher = (self.sweep_batcher is not None
                       and not self.sweep_batcher.bypass())
        chained_wave = use_batcher and self.sweep_batcher.supports_chained_waves()
        if chained_wave:
            # the chained wave encodes its texts on device unconditionally
            # (it only WRITES the query-embedding cache) — so a HOT repeated
            # query would re-pay the full encode forward on every arrival.
            # Check the cache first and route fully-cached requests through
            # the vector wave instead.
            cached = self.dual_encoder.cached_all(queries)
            if cached is not None:
                chained_wave = False
                per_model_vecs = cached
        elif use_batcher:
            with time_block("hybrid.encode"):
                per_model_vecs = self.dual_encoder.encode_all(queries, use_cache=True)

        ranked_lists: List[List[Tuple[int, float]]] = []

        if (self.retrieval_cfg.multivector_enabled
                and self.multivector_index is not None
                and self.token_encoder is not None
                and self.multivector_index.count() > 0):
            with time_block("hybrid.multivector"):
                for qtok in self.token_encoder.encode_tokens(queries):
                    hits = self.multivector_index.search_aggregate(
                        qtok, top_k=self.fusion_cfg.per_query_k)
                    ranked_lists.append([(h["child_id"], h["score"]) for h in hits])

        if use_batcher:
            with time_block("hybrid.search"):
                if chained_wave:
                    by_model = self.sweep_batcher.search_texts(
                        queries, self.fusion_cfg.per_query_k)
                    results = [by_model[name] for name in self.dual_encoder.names]
                else:
                    by_model = self.sweep_batcher.search_all(
                        per_model_vecs, self.fusion_cfg.per_query_k)
                    results = [by_model[name] for name in per_model_vecs]
        else:
            results = self._dense_results_chained(queries)
        for ids, scores in results:
            for qi in range(len(queries)):
                lst = [(int(c), float(s)) for c, s in zip(ids[qi], scores[qi]) if c != 0]
                ranked_lists.append(lst)

        if self.fusion_cfg.method == "rrf":
            combined_dense = rrf_fuse([[c for c, _ in lst] for lst in ranked_lists],
                                      k=self.fusion_cfg.rrf_k)
        else:
            combined_dense = minmax_avg_fuse(ranked_lists)

        # ---- candidate texts from child metadata
        candidate_ids = list(combined_dense.keys())
        with time_block("hybrid.meta"):
            metas = self.child_meta.get_children(candidate_ids)
        child_docs: Dict[int, str] = {}
        child_parent: Dict[int, int] = {}
        for cid in candidate_ids:
            m = metas.get(cid)
            if not m:
                continue
            text = m["snippet"]
            if m.get("context"):
                text = f"{text}\n{m['context']}".strip()
            child_docs[cid] = text
            child_parent[cid] = m["parent_id"]

        # ---- sparse: BM25 over candidates, max over query variants
        corpus_ids = list(child_docs.keys())
        bm25_scores: Dict[int, float] = {}
        if corpus_ids:
            with time_block("hybrid.bm25"):
                scorer = build_scorer([child_docs[c] for c in corpus_ids])
                for q in queries:
                    scores = scorer.score_text(q)
                    for cid, s in zip(corpus_ids, scores):
                        bm25_scores[cid] = max(bm25_scores.get(cid, 0.0), float(s))

        # ---- merge (reference rag_backend.py:791-795)
        n_corpus = len(corpus_ids) or 1
        merged = {
            cid: dense + bm25_scores.get(cid, 0.0) / n_corpus
            for cid, dense in combined_dense.items()
            if cid in child_docs
        }
        ranked = sorted(merged.items(), key=lambda kv: kv[1], reverse=True)[:max_children]

        self._hitk_diagnostic(ranked, child_docs)

        child_chunks = [
            {
                "chunk_id": f"child_{cid}",
                "child_id": cid,
                "chunk_text": child_docs[cid],
                "text": child_docs[cid],
                "retrieval_score": float(score),
                "retrieval_method": "child_hybrid",
                "parent_id": child_parent.get(cid),
                "source_path": metas[cid].get("source_path"),
                "source_mtime": metas[cid].get("source_mtime"),
                "document_id": metas[cid].get("document_id"),
            }
            for cid, score in ranked
        ]
        return child_chunks, child_parent, queries

    def _dense_results_chained(self, queries: List[str]):
        return chained_dense_search(
            self.dual_encoder, self.indexes, queries,
            self.fusion_cfg.per_query_k, timer_prefix="hybrid")

    def _hitk_diagnostic(self, ranked, child_docs) -> None:
        expect = (self.retrieval_cfg.hitk_expect_contains or "").strip()
        if not expect:
            return
        k = self.retrieval_cfg.hitk_k
        hit = any(expect.lower() in child_docs.get(cid, "").lower() for cid, _ in ranked[:k])
        log.info("[metrics] pre-rerank hit@%d=%s expect=%r", k, "YES" if hit else "NO", expect)
