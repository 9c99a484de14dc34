"""Query-trace JSON artifacts — the system's primary observability tool
(capability of reference rag_backend.py:1258-1289): every query writes
question, generated query variants, retrieved children with scores, the
exact LLM prompt, and the answer, as a diffable regression artifact."""

from __future__ import annotations

import hashlib
import json
import queue
import threading
import time
from pathlib import Path
from typing import Optional

from financial_rag_tpu.config import sanitize_for_json
from financial_rag_tpu.utils.logging import get_logger

log = get_logger("utils.tracing")


class QueryTracer:
    """Trace artifacts are written off the hot path: `write` snapshots the
    payload synchronously (cheap dict building) and hands the JSON encode +
    disk IO to one daemon worker — profiled at ~6ms per query inline, a
    large slice of the end-to-end latency once retrieval itself is ~1ms.
    `flush()` joins the queue (used by tests and shutdown); if the queue
    backs up (disk stall), writes fall back to inline so traces are never
    silently dropped."""

    # ONE module-shared writer thread (lazily started): per-instance
    # threads + atexit handlers would leak a pinned daemon thread per
    # Runtime built (test suites build many)
    _shared_queue: Optional[queue.Queue] = None
    _shared_lock = threading.Lock()

    def __init__(self, trace_dir: Optional[str | Path], *, background: bool = True) -> None:
        self.trace_dir = Path(trace_dir) if trace_dir else None
        self._background = background and self.trace_dir is not None

    @classmethod
    def _writer_queue(cls) -> queue.Queue:
        with cls._shared_lock:
            if cls._shared_queue is None:
                import atexit

                cls._shared_queue = queue.Queue(maxsize=256)
                threading.Thread(target=cls._drain, daemon=True,
                                 name="query-tracer").start()
                # short-lived processes (scripts, benches) must not lose
                # queued traces — or race a tempdir teardown — at exit
                atexit.register(cls._flush_shared)
            return cls._shared_queue

    @classmethod
    def _drain(cls) -> None:
        q = cls._shared_queue
        while True:
            path, payload = q.get()
            try:
                cls._write_file(path, payload)
            except Exception:  # noqa: BLE001 — a dead drain thread would
                log.exception("query-trace write failed")  # deadlock flush()
            finally:
                q.task_done()

    @staticmethod
    def _write_file(path: Path, payload: dict) -> None:
        try:
            path.write_text(json.dumps(payload, indent=2, default=str))
        except OSError as e:
            log.warning("failed to write query trace: %s", e)

    @classmethod
    def _flush_shared(cls) -> None:
        if cls._shared_queue is not None:
            cls._shared_queue.join()

    def flush(self) -> None:
        """Block until all queued traces are on disk."""
        self._flush_shared()

    def write(self, *, question: str, queries, children, parents, prompt: str,
              answer: str, timings: Optional[dict] = None, extra: Optional[dict] = None) -> Optional[Path]:
        if self.trace_dir is None:
            return None
        try:
            self.trace_dir.mkdir(parents=True, exist_ok=True)
        except OSError as e:
            log.warning("failed to create trace dir: %s", e)
            return None
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
        if self._background:
            try:
                self._writer_queue().put_nowait((path, payload))
                return path
            except queue.Full:
                pass  # disk can't keep up: write inline (backpressure)
        self._write_file(path, payload)
        return path
