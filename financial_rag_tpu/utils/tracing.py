"""Query-trace JSON artifacts — the system's primary observability tool
(capability of reference rag_backend.py:1258-1289): every query writes
question, generated query variants, retrieved children with scores, the
exact LLM prompt, and the answer, as a diffable regression artifact."""

from __future__ import annotations

import hashlib
import json
import time
from pathlib import Path
from typing import Optional

from financial_rag_tpu.config import sanitize_for_json
from financial_rag_tpu.utils.logging import get_logger

log = get_logger("utils.tracing")


class QueryTracer:
    def __init__(self, trace_dir: Optional[str | Path]) -> None:
        self.trace_dir = Path(trace_dir) if trace_dir else None

    def write(self, *, question: str, queries, children, parents, prompt: str,
              answer: str, timings: Optional[dict] = None, extra: Optional[dict] = None) -> Optional[Path]:
        if self.trace_dir is None:
            return None
        try:
            self.trace_dir.mkdir(parents=True, exist_ok=True)
            ts = time.strftime("%Y%m%d_%H%M%S")
            digest = hashlib.sha256(question.encode("utf-8")).hexdigest()[:8]
            path = self.trace_dir / f"query_trace_{ts}_{digest}.json"
            payload = sanitize_for_json({
                "timestamp": time.time(),
                "question": question,
                "generated_queries": list(queries),
                "children": [
                    {k: c.get(k) for k in
                     ("child_id", "parent_id", "retrieval_score", "final_rerank_score",
                      "cross_encoder_score", "text")}
                    for c in children
                ],
                "parents": [
                    {k: p.get(k) for k in ("parent_id", "document_id", "page_start", "page_end")}
                    for p in parents
                ],
                "prompt": prompt,
                "answer": answer,
                "timings": timings or {},
                **(extra or {}),
            })
            path.write_text(json.dumps(payload, indent=2, default=str))
            return path
        except OSError as e:
            log.warning("failed to write query trace: %s", e)
            return None
