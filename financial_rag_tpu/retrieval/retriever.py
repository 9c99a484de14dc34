"""Dense-only parent-context retriever.

Capability of reference parent_child/retriever.py:80-137: per-encoder query
embed -> per-model index search -> RRF(k=60) fuse -> child dedup ->
order-preserving parent dedup (<= dedup_parents) -> parent fetch. The two
encoder searches run as one batched device call per index.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from financial_rag_tpu.index.flat import FlatIndex
from financial_rag_tpu.models.encoder import DualEncoder
from financial_rag_tpu.retrieval.fusion import rrf_fuse
from financial_rag_tpu.store import ChildMetaStore, ParentStore
from financial_rag_tpu.utils import get_logger, time_block

log = get_logger("retrieval.retriever")


class ParentContextRetriever:
    def __init__(
        self,
        dual_encoder: DualEncoder,
        indexes: Dict[str, FlatIndex],
        parent_store: ParentStore,
        child_meta: ChildMetaStore,
        *,
        rrf_k: int = 60,
    ) -> None:
        self.dual_encoder = dual_encoder
        self.indexes = indexes
        self.parent_store = parent_store
        self.child_meta = child_meta
        self.rrf_k = rrf_k

    def query(self, text: str, top_k: int = 8, dedup_parents: int = 4) -> dict:
        # chained encode->sweep with one combined host pull (see
        # hybrid.chained_dense_search; same discipline as the hybrid raw
        # lane — the sequential per-model search() loop this replaces paid
        # ~4 RPC round trips per query through a tunneled chip)
        from financial_rag_tpu.retrieval.hybrid import chained_dense_search

        results = chained_dense_search(
            self.dual_encoder, self.indexes, [text], top_k,
            timer_prefix="retriever")

        ranked_lists: List[List[int]] = []
        scores_by_child: Dict[int, float] = {}
        for ids, scores in results:
            lst = [int(cid) for cid in ids[0] if cid != 0]
            ranked_lists.append(lst)
            for cid, s in zip(ids[0], scores[0]):
                if cid != 0:
                    scores_by_child[int(cid)] = max(scores_by_child.get(int(cid), -1e9), float(s))

        fused = rrf_fuse(ranked_lists, k=self.rrf_k)
        ordered = sorted(fused.items(), key=lambda kv: kv[1], reverse=True)[:top_k]
        child_ids = [cid for cid, _ in ordered]
        metas = self.child_meta.get_children(child_ids)

        child_hits = [
            {
                "child_id": cid,
                "rrf_score": fused[cid],
                "score": scores_by_child.get(cid),
                "parent_id": metas[cid]["parent_id"] if cid in metas else None,
                "snippet": metas[cid]["snippet"] if cid in metas else "",
                "context": metas[cid].get("context") if cid in metas else None,
            }
            for cid in child_ids
        ]

        parent_ids: List[int] = []
        for hit in child_hits:
            pid = hit["parent_id"]
            if pid is not None and pid not in parent_ids:
                parent_ids.append(pid)
            if len(parent_ids) >= dedup_parents:
                break
        parent_contexts = self.parent_store.get_parents_by_ids(parent_ids)

        return {"child_hits": child_hits, "parent_contexts": parent_contexts}
