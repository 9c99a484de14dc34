"""REST + SSE API server (WSGI, built on werkzeug).

The behavioral contract of reference api_server.py §2.3 (SURVEY.md): the
existing React UI (amber-ai-search) can be pointed at this server
unchanged. Endpoints:

  POST /search                  {query, filters} -> {documents, aiResponse, ...}
  POST /search-stream           SSE: chunks -> answer -> complete (errors as error events)
  GET  /health                  status + monitoring flag
  GET  /filters                 available filter values
  GET  /pdf?path=&download=     serve source files (path-traversal guarded)
  GET  /recent-documents        20 most recently modified sources
  GET  /monitoring-status       background-processor flag
  GET  /admin/processing-status per-document pipeline state
  POST /admin/reprocess         force re-ingest (all or listed files)
  POST /admin/cleanup           delete orphaned extraction artifacts
  GET  /metrics                 timing + cache + analytics (beyond reference)
  POST /feedback                store user feedback (beyond reference's stub)

Implementation note: the reference uses Flask; this environment ships only
werkzeug (Flask's WSGI core), so routing/dispatch is explicit — the wire
contract is identical.
"""

from __future__ import annotations

import json
import mimetypes
import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor, TimeoutError as FuturesTimeout
from datetime import datetime
from pathlib import Path
from typing import Optional

from werkzeug.exceptions import HTTPException, NotFound
from werkzeug.routing import Map, Rule
from werkzeug.wrappers import Request, Response

from financial_rag_tpu.config import FrameworkConfig
from financial_rag_tpu.engine import RAGEngine
from financial_rag_tpu.serving.formatting import (
    _ui_file_type,
    format_ai_response,
    format_chunks_for_ui,
)
from financial_rag_tpu.serving.processor import DocumentProcessor
from financial_rag_tpu.utils import get_logger, validate_and_sanitize_query
from financial_rag_tpu.utils.sanitize import QueryValidationError
from financial_rag_tpu.utils.timing import GLOBAL_TIMER

log = get_logger("serving.app")


def _json(payload, status: int = 200) -> Response:
    return Response(json.dumps(payload, default=str), status=status,
                    mimetype="application/json")


class RagApi:
    """WSGI application implementing the search API contract."""

    def __init__(
        self,
        engine: RAGEngine,
        *,
        processor: Optional[DocumentProcessor] = None,
        config: Optional[FrameworkConfig] = None,
        source_dir: Optional[str] = None,
        on_save=None,
    ) -> None:
        self.engine = engine
        self.processor = processor
        self._save_hook = on_save   # runtime-provided index persistence hook
        self.cfg = config or FrameworkConfig()
        self.src_dir = Path(source_dir or self.cfg.ingest.source_dir)
        self.executor = ThreadPoolExecutor(max_workers=8, thread_name_prefix="search")
        from financial_rag_tpu.utils.sysperf import SystemPerformanceRecorder

        self.sysperf = SystemPerformanceRecorder(
            engine.feedback_db, interval_s=self.cfg.serving.sysperf_interval_s)
        if engine.feedback_db is not None and self.cfg.serving.sysperf_interval_s > 0:
            self.sysperf.start()
        self.url_map = Map([
            Rule("/", endpoint="ui", methods=["GET"]),
            Rule("/search", endpoint="search", methods=["POST", "OPTIONS"]),
            Rule("/search-stream", endpoint="search_stream", methods=["POST", "OPTIONS"]),
            Rule("/health", endpoint="health", methods=["GET"]),
            Rule("/monitoring-status", endpoint="monitoring_status", methods=["GET"]),
            Rule("/filters", endpoint="filters", methods=["GET"]),
            Rule("/pdf", endpoint="pdf", methods=["GET"]),
            Rule("/recent-documents", endpoint="recent_documents", methods=["GET"]),
            Rule("/admin/processing-status", endpoint="processing_status", methods=["GET"]),
            Rule("/admin/reprocess", endpoint="reprocess", methods=["POST"]),
            Rule("/admin/cleanup", endpoint="cleanup", methods=["POST"]),
            Rule("/admin/compact", endpoint="compact", methods=["POST"]),
            Rule("/admin/save", endpoint="save", methods=["POST"]),
            Rule("/metrics", endpoint="metrics", methods=["GET"]),
            Rule("/feedback", endpoint="feedback", methods=["POST"]),
        ])

    # ---------------------------------------------------------------- WSGI

    def __call__(self, environ, start_response):
        request = Request(environ)
        try:
            adapter = self.url_map.bind_to_environ(environ)
            endpoint, _ = adapter.match()
            if request.method == "OPTIONS":
                response = Response("", status=204)
            else:
                response = getattr(self, f"on_{endpoint}")(request)
        except NotFound:
            response = _json({"error": "not found"}, 404)
        except HTTPException as e:
            response = _json({"error": e.description}, e.code or 500)
        except Exception as e:  # noqa: BLE001 — API errors become JSON
            log.exception("unhandled API error")
            response = _json({"error": str(e)}, 500)
        response.headers["Access-Control-Allow-Origin"] = "*"
        response.headers["Access-Control-Allow-Headers"] = "Content-Type"
        response.headers["Access-Control-Allow-Methods"] = "GET, POST, OPTIONS"
        return response(environ, start_response)

    # ------------------------------------------------------------------ UI

    def on_ui(self, request: Request) -> Response:
        page = Path(__file__).resolve().parent / "static" / "index.html"
        return Response(page.read_bytes(), mimetype="text/html")

    # -------------------------------------------------------------- search

    def _run_query(self, query: str, filters: Optional[dict]) -> dict:
        return self.engine.query(query, filters=filters)

    def on_search(self, request: Request) -> Response:
        body = request.get_json(silent=True) or {}
        try:
            query = validate_and_sanitize_query(body.get("query", ""),
                                                self.cfg.serving.max_query_len)
        except QueryValidationError as e:
            return _json({"error": str(e)}, 400)

        future = self.executor.submit(self._run_query, query, body.get("filters"))
        try:
            result = future.result(timeout=self.cfg.serving.request_timeout_s)
        except FuturesTimeout:
            self.sysperf.record_request(ok=False)
            return _json({"error": "Search timed out. Please try again."}, 504)
        except Exception:
            self.sysperf.record_request(ok=False)
            raise
        self.sysperf.record_request(ok=result.get("success", True))

        documents = format_chunks_for_ui(
            result.get("top_children_chunks") or result.get("chunks") or [])
        return _json({
            "documents": documents,
            "aiResponse": format_ai_response(result.get("answer", ""), documents),
            "query": query,
            "status": "success" if result.get("success", True) else "error",
            "method": "rag_enhanced",  # fixed label (reference api_server.py:922-928)
            "processingTime": result.get("processing_time"),
        })

    def on_search_stream(self, request: Request) -> Response:
        body = request.get_json(silent=True) or {}
        raw_query = body.get("query", "")
        filters = body.get("filters")
        delay = self.cfg.serving.sse_inter_event_delay_s
        timeout = self.cfg.serving.request_timeout_s

        def sse(payload: dict) -> str:
            return f"data: {json.dumps(payload, default=str)}\n\n"

        def generate():
            try:
                try:
                    query = validate_and_sanitize_query(raw_query, self.cfg.serving.max_query_len)
                except QueryValidationError as e:
                    yield sse({"type": "error", "data": {"error": str(e)}})
                    return
                # genuine progressive streaming: chunks flush as soon as
                # retrieval+rerank finish, the answer follows after LLM
                # synthesis (the reference computes everything, then sleeps
                # 0.5s between events — reference api_server.py:1137).
                # Each phase advances inside the executor with a deadline so
                # a hung retrieval/rerank/LLM call becomes a timeout event
                # (same bound on_search enforces with future.result).
                deadline = time.monotonic() + timeout
                stream = iter(self.engine.query_stream(query, filters=filters))
                streamed_docs: list = []   # chunks-phase documents, for refs
                done = object()
                while True:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        self.sysperf.record_request(ok=False)
                        yield sse({"type": "error",
                                   "data": {"error": "Streaming search timed out. Please try again."}})
                        return
                    step_future = self.executor.submit(next, stream, done)
                    try:
                        step = step_future.result(timeout=remaining)
                    except FuturesTimeout:
                        step_future.cancel()
                        self.sysperf.record_request(ok=False)
                        yield sse({"type": "error",
                                   "data": {"error": "Streaming search timed out. Please try again."}})
                        return
                    if step is done:
                        break
                    phase, payload = step
                    if phase == "chunks":
                        streamed_docs = format_chunks_for_ui(payload)
                        yield sse({"type": "chunks",
                                   "data": {"documents": streamed_docs}})
                        if delay:
                            time.sleep(delay)
                    elif phase == "answer_delta":
                        # progressive on-device LLM tokens (engine streams
                        # them only when the provider can); an extra event
                        # type — clients that only know chunks/answer/
                        # complete ignore it and still get the full answer
                        yield sse({"type": "answer_partial",
                                   "data": {"text": payload}})
                    else:  # complete
                        yield sse({"type": "answer",
                                   "data": {"aiResponse":
                                            format_ai_response(payload.get("answer", ""),
                                                               streamed_docs)}})
                        yield sse({"type": "complete",
                                   "data": {"status": "success", "method": "rag_enhanced"}})
                        self.sysperf.record_request(ok=True)
            except Exception as e:  # noqa: BLE001 — stream errors become events
                log.exception("search-stream failed")
                self.sysperf.record_request(ok=False)
                yield sse({"type": "error", "data": {"error": str(e)}})

        return Response(generate(), mimetype="text/event-stream",
                        headers={"Cache-Control": "no-cache", "X-Accel-Buffering": "no"})

    # ---------------------------------------------------------------- meta

    def on_health(self, request: Request) -> Response:
        return _json({
            **self.engine.health(),
            "status": "healthy",
            "monitoring_active": bool(self.processor and self.processor.running),
        })

    def on_monitoring_status(self, request: Request) -> Response:
        return _json({"monitoring_active": bool(self.processor and self.processor.running)})

    def on_filters(self, request: Request) -> Response:
        return _json({
            "fileTypes": ["pdf", "word", "excel", "ppt", "txt"],
            # only sources that actually back documents: every ingested
            # chunk is attributed "Windows Shares" (serving/formatting.py),
            # so advertising unbacked sources here would let the UI build
            # filters that silently match nothing (ADVICE r2)
            "dataSources": ["Windows Shares"],
            "timeRanges": ["all", "3days", "week", "month", "3months", "year",
                           "5years", "custom"],
        })

    def on_pdf(self, request: Request) -> Response:
        rel = request.args.get("path")
        if not rel:
            return _json({"error": "Path parameter is required"}, 400)
        base = self.src_dir.resolve()
        target = (base / rel).resolve()
        if target != base and not str(target).startswith(str(base) + os.sep):
            return _json({"error": "Access denied"}, 403)
        if not target.is_file():
            return _json({"error": "File not found"}, 404)
        download = request.args.get("download", "false").lower() == "true"
        mime = mimetypes.guess_type(str(target))[0] or "application/octet-stream"
        resp = Response(target.read_bytes(), mimetype=mime)
        if download:
            resp.headers["Content-Disposition"] = f'attachment; filename="{target.name}"'
        return resp

    def on_recent_documents(self, request: Request) -> Response:
        if not self.src_dir.is_dir():
            return _json({"documents": [], "status": "success"})
        files = []
        for p in self.src_dir.rglob("*"):
            if p.is_file():
                try:
                    files.append((p, p.stat().st_mtime))
                except OSError:
                    continue
        files.sort(key=lambda x: x[1], reverse=True)
        docs = [
            {
                "id": f"doc_{i}",
                "title": p.name,
                # same mapping search results use (_ui_file_type), so the
                # home screen's recent-docs icons agree with result cards
                "fileType": _ui_file_type(str(p)),
                "sourcePath": str(p),
                "lastAccessed": datetime.fromtimestamp(m).isoformat() + "Z",
                "sourceType": "Windows Shares",
            }
            for i, (p, m) in enumerate(files[:20], start=1)
        ]
        return _json({"documents": docs, "status": "success"})

    # --------------------------------------------------------------- admin

    def on_processing_status(self, request: Request) -> Response:
        if self.processor is None:
            return _json({"error": "processor not configured"}, 404)
        return _json(self.processor.status())

    def on_reprocess(self, request: Request) -> Response:
        if self.processor is None:
            return _json({"error": "processor not configured"}, 404)
        body = request.get_json(silent=True) or {}
        paths = body.get("files")
        if paths is None:
            paths = self.processor.ledger.scan(self.processor.source_dir)
        t = threading.Thread(target=self.processor.process_all,
                             kwargs={"force_paths": list(paths)}, daemon=True)
        t.start()
        return _json({"status": "started", "files": len(list(paths))})

    def on_cleanup(self, request: Request) -> Response:
        if self.processor is None:
            return _json({"error": "processor not configured"}, 404)
        return _json(self.processor.cleanup_orphans())

    def on_compact(self, request: Request) -> Response:
        """Index maintenance: compact tombstoned slots (flat) / retrain
        centroids (IVF) on every collection that supports it."""
        out = {}
        for name, idx in self.engine.hybrid.indexes.items():
            if hasattr(idx, "compact"):
                out[name] = {"reclaimed_slots": idx.compact()}
            elif hasattr(idx, "retrain"):
                idx.retrain()
                out[name] = {"retrained": True, "count": idx.count()}
            else:
                out[name] = {"skipped": True}
        return _json({"status": "ok", "collections": out})

    def on_save(self, request: Request) -> Response:
        """Persist every index to host storage NOW (on top of the
        automatic post-sweep persistence): an explicit checkpoint before
        planned maintenance or shutdown."""
        if self._save_hook is None:
            return _json({"error": "no persistence hook configured"}, 404)
        self._save_hook()
        return _json({"status": "saved",
                      "collections": list(self.engine.hybrid.indexes)})

    # -------------------------------------------------------------- extras

    def on_metrics(self, request: Request) -> Response:
        out = {"timings": GLOBAL_TIMER.summary(),
               "system": self.sysperf.snapshot()}
        # serving coalescing observability: per-wrapper wave stats, incl.
        # the LLM's direct/coalesced/continuous-engine split
        stats = getattr(self.engine.llm, "stats", None)
        if callable(stats):
            out["llm_batching"] = stats()
        if self.engine.feedback_db is not None:
            out["performance"] = self.engine.feedback_db.performance_summary()
            out["suggestions"] = self.engine.feedback_db.optimization_suggestions()
            out["system_history"] = self.engine.feedback_db.recent_system_performance()
        return _json(out)

    def on_feedback(self, request: Request) -> Response:
        if self.engine.feedback_db is None:
            return _json({"error": "feedback db not configured"}, 404)
        body = request.get_json(silent=True) or {}
        if not body.get("query"):
            return _json({"error": "query is required"}, 400)
        fid = self.engine.feedback_db.store_feedback(
            query=body["query"], rating=body.get("rating"),
            comment=body.get("comment"), session_id=body.get("session_id"))
        return _json({"status": "stored", "id": fid})


def create_app(
    engine: RAGEngine,
    *,
    processor: Optional[DocumentProcessor] = None,
    config: Optional[FrameworkConfig] = None,
    source_dir: Optional[str] = None,
    on_save=None,
) -> RagApi:
    return RagApi(engine, processor=processor, config=config,
                  source_dir=source_dir, on_save=on_save)


def run_server(app: RagApi, host: str = "0.0.0.0", port: int = 5000) -> None:
    from werkzeug.serving import run_simple

    run_simple(host, port, app, threaded=True)
