"""RAG engine + Flask API contract tests (reference §2.3 endpoints),
feedback DB, processing ledger, and UI formatting."""

import json
import time

import pytest

from financial_rag_tpu.engine import RAGEngine
from financial_rag_tpu.index import FlatIndex
from financial_rag_tpu.ingest.ledger import ProcessingLedger, file_sha256
from financial_rag_tpu.ingest.pipeline import IngestionPipeline, collection_slug
from financial_rag_tpu.models.encoder import DualEncoder
from financial_rag_tpu.models.hashing import HashingEncoder
from financial_rag_tpu.retrieval.hybrid import HybridRetriever
from financial_rag_tpu.retrieval.rerank import CrossEncoderReranker
from financial_rag_tpu.serving.app import create_app
from financial_rag_tpu.serving.formatting import format_ai_response, format_chunks_for_ui
from financial_rag_tpu.serving.processor import DocumentProcessor
from financial_rag_tpu.store import ChildMetaStore, ParentStore
from financial_rag_tpu.store.feedback_db import FeedbackDatabase
from financial_rag_tpu.utils.tracing import QueryTracer


@pytest.fixture
def stack(tmp_path):
    enc = DualEncoder({
        "baai": HashingEncoder(dim=128, salt=1),
        "gte": HashingEncoder(dim=128, salt=2),
    })
    indexes = {n: FlatIndex(dim=128, capacity=1024, name=collection_slug(n)) for n in enc.names}
    parent_store = ParentStore(tmp_path / "p.db")
    child_meta = ChildMetaStore(tmp_path / "c.db")
    pipe = IngestionPipeline(enc, parent_store, child_meta, indexes)

    src = tmp_path / "Source_Documents"
    src.mkdir()
    docs = {
        "lease": "The rent for the second year is Rs 42,800 per month. "
                 "The lock-in period is 36 months. The lessor is M/s Bhartiya Enterprises. " * 4,
        "invoice": "Tax Invoice INV-42: total amount Rs 1,18,000. GST amount Rs 18,000 at 18 percent. " * 4,
    }
    for doc_id, text in docs.items():
        f = src / f"{doc_id}.json"
        f.write_text(json.dumps({"blocks": [{"content": text, "page": 0}]}))
        pipe.ingest_extracted_json(f, doc_id, source_path=str(f),
                                   source_mtime=f.stat().st_mtime)

    hybrid = HybridRetriever(enc, indexes, child_meta)
    fdb = FeedbackDatabase(tmp_path / "fb.db")
    engine = RAGEngine(hybrid, parent_store, CrossEncoderReranker(None),
                       feedback_db=fdb, tracer=QueryTracer(tmp_path / "test_logs"))
    ledger = ProcessingLedger(tmp_path / ".processing_state.json")
    processor = DocumentProcessor(pipe, ledger, source_dir=src,
                                  extracted_dir=tmp_path / "extracted")
    from werkzeug.test import Client

    app = create_app(engine, processor=processor, source_dir=str(src))
    return engine, Client(app), tmp_path, processor, fdb


class TestEngine:
    def test_query_schema_and_answer_fallback(self, stack):
        engine, client, tmp_path, processor, fdb = stack
        out = engine.query("What is the rent for the second year?")
        assert out["success"]
        for key in ("answer", "llm_prompt", "corrected_query", "multiqueries", "chunks",
                    "top_children_chunks", "processing_time", "avg_relevance_score",
                    "query_strategy", "retrieval_method", "retrieval_info"):
            assert key in out, key
        assert "42,800" in out["answer"]  # NullLLM fallback shows context
        assert out["retrieval_info"]["queries"] == ["What is the rent for the second year?"]
        # trace artifact written (asynchronously; flush to disk first)
        engine.tracer.flush()
        traces = list((tmp_path / "test_logs").glob("query_trace_*.json"))
        assert traces
        trace = json.loads(traces[0].read_text())
        assert trace["question"] == "What is the rent for the second year?"
        assert trace["children"]

    def test_result_cache_hit(self, stack):
        engine, *_ = stack
        q = "What is the GST amount?"
        first = engine.query(q)
        engine.flush_background()   # cache write is deferred off the hot path
        second = engine.query(q)
        assert not first.get("cache_hit")
        assert second.get("cache_hit")

    def test_query_stream_phases(self, stack):
        engine, *_ = stack
        events = list(engine.query_stream("What is the rent for the second year?"))
        assert [p for p, _ in events] == ["chunks", "complete"]
        chunks, result = events[0][1], events[1][1]
        assert chunks and "text" in chunks[0]
        assert result["success"] and "42,800" in result["answer"]

    def test_query_stream_filter_no_match(self, stack):
        engine, *_ = stack
        events = list(engine.query_stream("rent", filters={"fileType": ["word"]}))
        assert events[0] == ("chunks", [])
        assert "No documents matched" in events[1][1]["answer"]

    def test_filter_no_match_message(self, stack):
        engine, *_ = stack
        out = engine.query("rent amount", filters={"fileType": ["word"]})
        assert "No documents matched your filter" in out["answer"]
        assert out["chunks"] == []

    def test_aggregation_strategy_detected(self, stack):
        engine, *_ = stack
        out = engine.query("What is the total sum of all invoice amounts combined?")
        assert out["query_strategy"] == "Aggregation"

    @pytest.mark.smoke
    def test_health(self, stack):
        engine, *_ = stack
        h = engine.health()
        assert h["status"] == "ok"
        assert h["parents"] == 2
        assert all(v > 0 for v in h["indexes"].values())


class TestAPI:
    @pytest.mark.smoke
    def test_search_endpoint(self, stack):
        engine, client, *_ = stack
        resp = client.post("/search", json={"query": "Who is the lessor?"})
        assert resp.status_code == 200
        data = resp.get_json()
        assert data["status"] == "success"
        assert data["documents"]
        doc = data["documents"][0]
        for key in ("id", "sourceType", "sourcePath", "fileType", "title", "date",
                    "snippet", "author", "score"):
            assert key in doc
        assert data["aiResponse"]["summary"]
        assert data["aiResponse"]["items"]

    def test_search_rejects_bad_query(self, stack):
        engine, client, *_ = stack
        assert client.post("/search", json={"query": ""}).status_code == 400
        assert client.post("/search", json={"query": "x" * 5000}).status_code == 400

    @pytest.mark.smoke
    def test_search_stream_events(self, stack):
        engine, client, *_ = stack
        resp = client.post("/search-stream", json={"query": "GST amount"})
        assert resp.status_code == 200
        events = [json.loads(line[6:]) for line in
                  resp.get_data(as_text=True).splitlines() if line.startswith("data: ")]
        types = [e["type"] for e in events]
        assert types == ["chunks", "answer", "complete"]
        assert events[0]["data"]["documents"]
        assert events[1]["data"]["aiResponse"]["summary"]

    def test_search_stream_hung_phase_times_out(self, stack):
        """A retrieval/rerank/LLM phase that blocks must surface as an SSE
        error event bounded by request_timeout_s, not hang the stream
        (on_search already bounds its whole query the same way)."""
        import time as _time

        engine, client, *_ = stack
        rag_api = client.application  # the RagApi WSGI instance

        def hung_stream(query, filters=None):
            _time.sleep(30)
            yield "chunks", []

        orig_stream = engine.query_stream
        orig_timeout = rag_api.cfg.serving.request_timeout_s
        engine.query_stream = hung_stream
        rag_api.cfg.serving.request_timeout_s = 0.5
        try:
            t0 = _time.monotonic()
            resp = client.post("/search-stream", json={"query": "GST amount"})
            events = [json.loads(line[6:]) for line in
                      resp.get_data(as_text=True).splitlines()
                      if line.startswith("data: ")]
            elapsed = _time.monotonic() - t0
            assert elapsed < 10, f"stream hung {elapsed:.1f}s"
            assert events and events[-1]["type"] == "error"
            assert "timed out" in events[-1]["data"]["error"]
        finally:
            engine.query_stream = orig_stream
            rag_api.cfg.serving.request_timeout_s = orig_timeout

    def test_system_performance_recorded(self, stack):
        """Requests feed the system_performance table and /metrics surfaces
        both a live snapshot and history (reference feedback_database.py:
        673-694 records cpu/mem/qpm/error-rate periodically)."""
        engine, client, tmp_path, processor, fdb = stack
        rag_api = client.application
        client.post("/search", json={"query": "GST amount"})
        # stream records on the complete event -> must consume the generator
        client.post("/search-stream", json={"query": "invoice total"}).get_data()
        row = rag_api.sysperf.record_now()  # deterministic snapshot for the test
        assert row["queries_per_minute"] >= 2
        assert row["error_rate"] == 0.0
        hist = fdb.recent_system_performance()
        assert hist and hist[0]["queries_per_minute"] >= 2
        m = client.get("/metrics").get_json()
        assert "system" in m
        assert m["system_history"][0]["queries_per_minute"] >= 2

    def test_health_filters_monitoring(self, stack):
        engine, client, *_ = stack
        assert client.get("/health").get_json()["status"] == "healthy"
        f = client.get("/filters").get_json()
        assert "pdf" in f["fileTypes"] and "custom" in f["timeRanges"]
        assert client.get("/monitoring-status").get_json()["monitoring_active"] is False

    def test_pdf_traversal_guard(self, stack):
        engine, client, *_ = stack
        resp = client.get("/pdf?path=../../etc/passwd")
        assert resp.status_code in (403, 404)
        resp2 = client.get("/pdf?path=lease.json")
        assert resp2.status_code == 200

    def test_recent_documents(self, stack):
        engine, client, *_ = stack
        data = client.get("/recent-documents").get_json()
        assert data["status"] == "success"
        assert len(data["documents"]) == 2
        assert data["documents"][0]["title"].endswith(".json")

    def test_admin_processing_status_and_cleanup(self, stack):
        engine, client, tmp_path, processor, fdb = stack
        processor.process_all()
        data = client.get("/admin/processing-status").get_json()
        assert data["summary"]["total"] == 2
        assert data["summary"]["embedded"] == 2
        assert client.post("/admin/cleanup").get_json()["removed"] == []

    def test_admin_compact(self, stack):
        engine, client, *_ = stack
        data = client.post("/admin/compact").get_json()
        assert data["status"] == "ok"
        assert set(data["collections"]) == {"baai", "gte"}
        assert all("reclaimed_slots" in v for v in data["collections"].values())

    def test_ui_served_at_root(self, stack):
        engine, client, *_ = stack
        resp = client.get("/")
        assert resp.status_code == 200
        body = resp.get_data(as_text=True)
        assert "search-stream" in body and "<html" in body
        # component-for-component surfaces mirroring amber-ai-search:
        # App.tsx state machine + every components/*.tsx counterpart
        for marker in (
                'id="home"', 'id="resultsView"',            # App.tsx views
                "Ctrl + K", "Lately interacted documents",   # HomeScreen.tsx
                'id="clearQ"', 'id="applyFilters"',          # Header.tsx
                'id="headStatus"',
                'id="ftMenu"', 'id="dsMenu"',                # FilterDropdown.tsx
                'id="trMenu"', "customStart", "customEnd",   # TimeFilterDropdown
                'id="leftPane"', "Ready to search",          # LeftPane.tsx
                "No results found",
                "More highlights", "Page Preview",           # DocumentCard.tsx
                "truncatePath", "Path copied",               # FilePath.tsx
                "Financial Document Intelligence",           # RightPane.tsx
                "Analyzing your query",                      # LoadingScreen.tsx
                "refchip", "typewrite",                      # AiAnswer/Typewriter
                'id="pdfFrame"', 'id="pdfZoomPct"',          # PdfViewer.tsx
                'id="pdfPage"',
                'id="chatBtn"',                              # ChatWidget.tsx
                "appliedFilters",                            # staged vs applied
                "recent-documents", "/search", "search-stream"):
            assert marker in body, marker

    def test_feedback_and_metrics(self, stack):
        engine, client, *_ = stack
        r = client.post("/feedback", json={"query": "test q", "rating": 4})
        assert r.get_json()["status"] == "stored"
        m = client.get("/metrics").get_json()
        assert "timings" in m and "performance" in m


class TestFormatting:
    @pytest.mark.smoke
    def test_ai_response_table_conversion(self):
        out = format_ai_response(
            "<p>Summary line</p><table><tr><th>Year</th><th>Rent</th></tr>"
            "<tr><td>1</td><td>40,000</td></tr></table>")
        text = out["items"][0]["text"]
        assert "| Year | Rent |" in text
        assert "| --- | --- |" in text
        assert out["summary"].startswith("Summary line")

    def test_ai_response_empty(self):
        assert format_ai_response("") == {"summary": "No response generated", "items": []}

    def test_ai_response_extracts_citation_references(self):
        """[N] markers become AiReference {id, docId} pairs — the exact
        wire shape the reference UI's click-to-scroll consumes
        (reference api_server.py:1147, App.tsx:154-166 / types.ts)."""
        docs = [{"id": f"child_{i}"} for i in range(4)]
        out = format_ai_response(
            "The rent is Rs 42,800 [1]. The lock-in period is 36 months [3]. "
            "See also [1] and the year [2024] which is not a citation.", docs)
        assert out["items"][0]["references"] == [
            {"id": 1, "docId": "child_0"}, {"id": 3, "docId": "child_2"}]
        # no documents supplied: ids fall back to format_chunks_for_ui's
        # 0-based doc_{i} defaults
        out = format_ai_response("rent [2]")
        assert out["items"][0]["references"] == [{"id": 2, "docId": "doc_1"}]
        # no markers: cite the first five documents, like the reference
        out = format_ai_response("plain answer", docs)
        assert [r["id"] for r in out["items"][0]["references"]] == [1, 2, 3, 4]
        # no markers and no documents: nothing to cite
        assert format_ai_response("plain answer")["items"][0]["references"] == []
        # markers beyond the document list are dropped
        out = format_ai_response("see [9]", docs)
        assert out["items"][0]["references"] == []

    def test_chunks_formatting_types(self):
        docs = format_chunks_for_ui([
            {"child_id": 5, "document_id": "lease", "source_path": "/x/lease.pdf",
             "text": "snippet text", "final_rerank_score": 0.7, "source_mtime": 1700000000.0},
            "bare string chunk",
        ])
        assert docs[0]["id"] == "5"
        assert docs[0]["fileType"] == "pdf"
        assert docs[0]["score"] == 0.7
        assert docs[0]["date"] != "Unknown"
        assert docs[1]["fileType"] == "txt"


class TestFeedbackDB:
    @pytest.mark.smoke
    def test_cache_ttl(self, tmp_path):
        db = FeedbackDatabase(tmp_path / "f.db", cache_ttl_s=10.0)
        db.cache_put("h1", "q", {"answer": "a"}, now=1000.0)
        assert db.cache_get("h1", now=1005.0) == {"answer": "a"}
        assert db.cache_get("h1", now=1011.0) is None
        stats = db.cache_stats()
        assert stats["entries"] == 1 and stats["total_hits"] == 1

    def test_analytics(self, tmp_path):
        db = FeedbackDatabase(tmp_path / "f.db")
        for i in range(6):
            db.store_feedback(query=f"rent amount question {i}", rating=4,
                              response_time_s=1.0)
        db.store_feedback(query="slow outlier question", rating=2, response_time_s=50.0)
        assert db.performance_summary()["total_queries"] == 7
        kw = dict(db.keyword_frequency())
        assert kw.get("rent") == 6
        anomalies = db.detect_anomalies(z_threshold=2.0)
        assert anomalies and anomalies[0]["query"] == "slow outlier question"
        assert db.temporal_patterns()


class TestLedger:
    def test_change_detection_and_resume(self, tmp_path):
        f = tmp_path / "doc.txt"
        f.write_text("version one")
        ledger = ProcessingLedger(tmp_path / "state.json")
        assert ledger.needs_processing(str(f))
        st = ledger.refresh_entry(str(f))
        assert st.sha256 == file_sha256(f)
        ledger.mark(str(f), extracted=True, chunked=True, embedded=True)
        assert not ledger.needs_processing(str(f))
        # persisted state survives reload
        ledger.save()
        ledger2 = ProcessingLedger(tmp_path / "state.json")
        assert not ledger2.needs_processing(str(f))
        # content change detected even with same size (sha differs)
        time.sleep(0.01)
        f.write_text("version two")
        assert ledger2.has_changed(str(f))
        assert ledger2.needs_processing(str(f))

    def test_remove_missing(self, tmp_path):
        f = tmp_path / "gone.txt"
        f.write_text("x")
        ledger = ProcessingLedger(tmp_path / "state.json")
        ledger.refresh_entry(str(f))
        f.unlink()
        gone = ledger.remove_missing([])
        assert gone == [str(f)]
        assert ledger.summary()["total"] == 0

    def test_loads_legacy_flat_format(self, tmp_path):
        """Pre-tombstone ledgers were a flat {path: state} JSON; they must
        load unchanged (states intact, no tombstones)."""
        import dataclasses

        from financial_rag_tpu.ingest.ledger import DocumentState

        legacy = {"/x/a.pdf": dataclasses.asdict(
            DocumentState(path="/x/a.pdf", size=3, mtime=1.0, sha256="s",
                          extracted=True, chunked=True, embedded=True))}
        p = tmp_path / "state.json"
        p.write_text(json.dumps(legacy))
        ledger = ProcessingLedger(p)
        assert ledger.states["/x/a.pdf"].embedded
        assert ledger.purge_tombstones() == []

    def test_purge_tombstones_persist(self, tmp_path):
        ledger = ProcessingLedger(tmp_path / "state.json")
        ledger.add_purge_tombstone("doc9", [3, 1])
        ledger.add_purge_tombstone("doc9", [1, 7])   # merges, never duplicates
        ledger.save()
        ledger2 = ProcessingLedger(tmp_path / "state.json")
        assert ledger2.purge_tombstones() == [
            {"doc_id": "doc9", "child_ids": [1, 3, 7]}]
        ledger2.clear_purge_tombstones()
        ledger2.save()
        assert ProcessingLedger(tmp_path / "state.json").purge_tombstones() == []


class TestProcessor:
    def test_full_sweep_and_resume(self, stack):
        engine, client, tmp_path, processor, fdb = stack
        out = processor.process_all()
        assert len(out["processed"]) == 2 and not out["failed"]
        # second sweep: nothing to do
        out2 = processor.process_all()
        assert out2["processed"] == [] and len(out2["skipped"]) == 2
        # modify a source -> reprocessed with cleanup
        src = tmp_path / "Source_Documents" / "lease.json"
        time.sleep(0.01)
        src.write_text(json.dumps({"blocks": [
            {"content": "Updated lease: rent is now Rs 50,000 per month. " * 10, "page": 0}]}))
        out3 = processor.process_all()
        assert str(src) in out3["processed"]
        # the engine should now see the updated content
        res = engine.query("what is the updated monthly rent now")
        assert "50,000" in res["answer"]

    def test_purge_survives_failed_attempt(self, stack, monkeypatch):
        """A changed document whose re-ingest FAILS mid-attempt must still
        purge its old content on the successful retry: refresh_entry
        records the new sha at begin-time, so without the persisted
        pending_purge flag the retry would see has_changed()=False and
        leave the superseded version's children live forever."""
        engine, client, tmp_path, processor, fdb = stack
        processor.process_all()
        src = tmp_path / "Source_Documents" / "lease.json"
        time.sleep(0.01)
        src.write_text(json.dumps({"blocks": [
            {"content": "Superseding lease: rent becomes Rs 77,000 monthly. " * 10,
             "page": 0}]}))

        # first attempt dies AFTER the ledger refreshed the new sha
        import financial_rag_tpu.serving.processor as proc_mod
        real = proc_mod.run_marker
        calls = {"n": 0}

        def flaky(path, out_dir):
            if str(src) in str(path) and calls["n"] == 0:
                calls["n"] += 1
                raise RuntimeError("transient extractor failure")
            return real(path, out_dir)

        monkeypatch.setattr(proc_mod, "run_marker", flaky)
        out = processor.process_all()
        assert str(src) in out["failed"]
        assert processor.ledger.states[str(src)].pending_purge is True

        # retry succeeds and must have purged the OLD version
        out2 = processor.process_all()
        assert str(src) in out2["processed"]
        assert processor.ledger.states[str(src)].pending_purge is False
        res = engine.query("monthly rent amount")
        texts = " ".join(c["text"] for c in res["top_children_chunks"])
        assert "77,000" in texts
        assert "42,800" not in texts, "superseded content still indexed"


    def test_failed_checkpoint_keeps_purge_obligation_for_deleted_sources(self, tmp_path):
        """ADVICE r3: remove_missing drops the ledger entry outright, so a
        FAILED index checkpoint on a deletion-heavy sweep used to leave no
        retry obligation — a restart onto the stale checkpoint resurrected
        the purged vectors as metadata-less ghosts forever. The purge
        tombstone must survive the failure and drive a re-purge + fresh
        checkpoint on the next sweep."""
        src = tmp_path / "src"
        src.mkdir()
        f = src / "doomed.txt"
        f.write_text("content")
        ledger = ProcessingLedger(tmp_path / "state.json")
        ledger.refresh_entry(str(f))
        ledger.save()

        class FakePipe:
            def __init__(self):
                self.removed = []

            def remove_document(self, doc_id):
                self.removed.append(doc_id)

        failing = {"on": True}
        checkpoints = {"ok": 0}

        def checkpoint():
            if failing["on"]:
                raise RuntimeError("disk full")
            checkpoints["ok"] += 1

        pipe = FakePipe()
        proc = DocumentProcessor(pipe, ledger, source_dir=src,
                                 extracted_dir=tmp_path / "ex",
                                 on_sweep_complete=checkpoint)
        f.unlink()                       # source deleted
        proc.process_all()               # purge runs, checkpoint FAILS
        assert pipe.removed == ["doomed"]
        # the obligation is durable (fresh process would see it)
        assert [t["doc_id"] for t in
                ProcessingLedger(tmp_path / "state.json").purge_tombstones()] \
            == ["doomed"]

        # "restart": fresh processor/pipeline over the persisted ledger —
        # the sweep re-purges the ghost and a successful checkpoint
        # discharges the obligation
        failing["on"] = False
        ledger2 = ProcessingLedger(tmp_path / "state.json")
        pipe2 = FakePipe()
        proc2 = DocumentProcessor(pipe2, ledger2, source_dir=src,
                                  extracted_dir=tmp_path / "ex",
                                  on_sweep_complete=checkpoint)
        proc2.process_all()
        assert pipe2.removed == ["doomed"]
        assert checkpoints["ok"] == 1
        assert ProcessingLedger(tmp_path / "state.json").purge_tombstones() == []
        # ...and a further sweep does nothing
        proc2.process_all()
        assert pipe2.removed == ["doomed"]


class TestActiveGauge:
    """The engine brackets every request (incl. streaming and error paths)
    with the shared ActiveCount used by the serving batchers' adaptive
    direct-lane policy — a leaked enter() would permanently inflate the
    gauge and silently disable the direct lane."""

    def _engine(self, stack):
        from financial_rag_tpu.serving.batcher import ActiveCount

        engine = stack[0]
        engine.active = ActiveCount()
        return engine

    def test_query_balances_gauge(self, stack):
        engine = self._engine(stack)
        engine.query("what is the rent")
        assert engine.active.value() == 0

    def test_stream_balances_gauge(self, stack):
        engine = self._engine(stack)
        list(engine.query_stream("what is the gst amount"))
        assert engine.active.value() == 0

    def test_error_path_balances_gauge(self, stack, monkeypatch):
        engine = self._engine(stack)
        def boom(*a, **k):
            raise RuntimeError("retrieval exploded")
        monkeypatch.setattr(engine.hybrid, "retrieve_children", boom)
        out = engine.query("anything")
        assert not out["success"]
        assert engine.active.value() == 0
        events = dict(engine.query_stream("anything"))
        assert events["complete"]["success"] is False
        assert engine.active.value() == 0

    def test_abandoned_stream_balances_gauge(self, stack):
        """A consumer that stops mid-stream must still release the gauge
        when the generator is closed (GeneratorExit runs the finally)."""
        engine = self._engine(stack)
        gen = engine.query_stream("what is the rent")
        next(gen)           # chunks event only
        gen.close()
        assert engine.active.value() == 0


class TestStreamingAnswer:
    """Progressive answer tokens: engine yields answer_delta phases when the
    provider can stream (llm/provider.py::stream_answer); the server maps
    them to `answer_partial` SSE events ahead of the final `answer`."""

    class _StreamingLLM:
        name = "fake-stream"

        def available(self):
            return True

        def generate(self, prompt, *, max_tokens=1024):
            return "full fallback answer"

        def generate_stream(self, prompt, *, max_tokens=1024):
            yield "The rent "
            yield "is Rs 42,800."

    def test_engine_streams_answer_deltas(self, stack):
        engine, *_ = stack
        orig = engine.llm
        engine.llm = self._StreamingLLM()
        try:
            phases = list(engine.query_stream("GST amount"))
        finally:
            engine.llm = orig
        kinds = [k for k, _ in phases]
        assert kinds == ["chunks", "answer_delta", "answer_delta", "complete"]
        deltas = [p for k, p in phases if k == "answer_delta"]
        result = phases[-1][1]
        # the final answer IS the streamed text (no second generation)
        assert result["answer"] == "".join(deltas).strip()

    def test_sse_answer_partial_events(self, stack):
        engine, client, *_ = stack
        orig = engine.llm
        engine.llm = self._StreamingLLM()
        try:
            resp = client.post("/search-stream", json={"query": "GST amount"})
            # drain INSIDE the swap: the SSE body is generated lazily
            body = resp.get_data(as_text=True)
        finally:
            engine.llm = orig
        events = [json.loads(line[6:]) for line in body.splitlines()
                  if line.startswith("data: ")]
        types = [e["type"] for e in events]
        assert types == ["chunks", "answer_partial", "answer_partial",
                         "answer", "complete"]
        partial = "".join(e["data"]["text"] for e in events
                          if e["type"] == "answer_partial")
        assert partial == "The rent is Rs 42,800."
        assert events[-2]["data"]["aiResponse"]["summary"].startswith("The rent")

    def test_non_streaming_provider_unchanged(self, stack):
        """NullLLM (no generate_stream) must keep the exact old event flow."""
        engine, client, *_ = stack
        resp = client.post("/search-stream", json={"query": "GST amount"})
        types = [json.loads(line[6:])["type"] for line in
                 resp.get_data(as_text=True).splitlines()
                 if line.startswith("data: ")]
        assert types == ["chunks", "answer", "complete"]

    def test_stream_failure_degrades_to_synthesize(self, stack):
        engine, *_ = stack

        class BrokenStream(self._StreamingLLM):
            def generate_stream(self, prompt, *, max_tokens=1024):
                raise RuntimeError("boom")
                yield  # pragma: no cover

        orig = engine.llm
        engine.llm = BrokenStream()
        try:
            phases = list(engine.query_stream("GST amount"))
        finally:
            engine.llm = orig
        assert [k for k, _ in phases] == ["chunks", "complete"]
        # degradation: falls back to generate() via synthesize_answer
        assert phases[-1][1]["answer"] == "full fallback answer"

    def test_mid_stream_failure_regenerates_not_truncates(self, stack):
        """A stream that dies AFTER emitting deltas must not have its
        truncated fragment stored as the final answer — the engine
        regenerates via synthesize_answer (the final `answer`/`complete`
        events replace the progressive text client-side)."""
        engine, *_ = stack

        class DiesMidStream(self._StreamingLLM):
            def generate_stream(self, prompt, *, max_tokens=1024):
                yield "The rent is Rs 42,"
                raise RuntimeError("tunnel RPC died mid-generation")

        orig = engine.llm
        engine.llm = DiesMidStream()
        try:
            phases = list(engine.query_stream("GST amount"))
        finally:
            engine.llm = orig
        kinds = [k for k, _ in phases]
        assert kinds == ["chunks", "answer_delta", "complete"]
        assert phases[-1][1]["answer"] == "full fallback answer"
