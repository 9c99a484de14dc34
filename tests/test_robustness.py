"""Concurrency safety and failure-injection tests (SURVEY.md §5.2-5.3: the
reference has essentially no concurrency safety and degrades layer by
layer; this framework must do both deliberately)."""

import json
import threading

import numpy as np
import pytest

from financial_rag_tpu.index import FlatIndex
from financial_rag_tpu.llm.provider import chunk_context, normalize_query, synthesize_answer
from financial_rag_tpu.store.feedback_db import FeedbackDatabase


class _ExplodingLLM:
    name = "exploding"

    def available(self) -> bool:
        return True

    def generate(self, prompt, *, max_tokens=1024):
        raise ConnectionError("network down")


class _NoneLLM:
    """Available but returns None (provider exhausted retries)."""

    name = "nonellm"

    def available(self) -> bool:
        return True

    def generate(self, prompt, *, max_tokens=1024):
        return None


class TestConcurrency:
    def test_concurrent_upsert_and_search(self, rng):
        idx = FlatIndex(dim=64, capacity=2048, dtype=np.float32)
        errors = []

        def writer(base):
            try:
                for i in range(10):
                    v = rng.standard_normal((8, 64)).astype(np.float32)
                    ids = np.arange(base + i * 8, base + i * 8 + 8, dtype=np.int64) + 1
                    idx.upsert(ids, v)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        def reader():
            try:
                for _ in range(20):
                    q = rng.standard_normal((2, 64)).astype(np.float32)
                    idx.search(q, 5)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=writer, args=(w * 1000,)) for w in range(4)]
        threads += [threading.Thread(target=reader) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        assert idx.count() == 4 * 10 * 8

    def test_concurrent_mutation_ivf_and_sharded(self, rng):
        """Writers + readers racing on IVF and sharded-IVF: no exceptions,
        final count exact, post-race search sees every survivor (guards the
        round-1 stale-compiled-search class of bug under concurrency)."""
        import jax.numpy as jnp

        from financial_rag_tpu.index import IVFIndex
        from financial_rag_tpu.parallel.sharded_ivf import ShardedIVFIndex

        for idx in (IVFIndex(dim=64, nlist=4, list_size=128, nprobe=4,
                             dtype=jnp.float32),
                    ShardedIVFIndex(dim=64, n_shards=2, nlist=4, list_size=128,
                                    nprobe=4, dtype=jnp.float32)):
            idx.upsert(np.arange(1, 33, dtype=np.int64),
                       rng.standard_normal((32, 64)).astype(np.float32))
            errors = []

            def writer(base, index=idx):
                try:
                    for i in range(5):
                        v = rng.standard_normal((4, 64)).astype(np.float32)
                        ids = np.arange(base + i * 4, base + i * 4 + 4,
                                        dtype=np.int64) + 100
                        index.upsert(ids, v)
                except Exception as e:  # noqa: BLE001
                    errors.append(e)

            def reader(index=idx):
                try:
                    for _ in range(10):
                        q = rng.standard_normal((2, 64)).astype(np.float32)
                        index.search(q, 5)
                except Exception as e:  # noqa: BLE001
                    errors.append(e)

            threads = [threading.Thread(target=writer, args=(w * 100,))
                       for w in range(3)]
            threads += [threading.Thread(target=reader) for _ in range(3)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert not errors, errors
            assert idx.count() == 32 + 3 * 5 * 4
            # a fresh upsert after the storm is immediately searchable
            probe = rng.standard_normal((1, 64)).astype(np.float32)
            probe /= np.linalg.norm(probe)
            idx.upsert([99999], probe)
            got, _ = idx.search(probe, 1)
            assert got[0, 0] == 99999

    def test_concurrent_feedback_db(self, tmp_path):
        db = FeedbackDatabase(tmp_path / "f.db")
        errors = []

        def worker(wid):
            try:
                for i in range(20):
                    db.store_feedback(query=f"q{wid}-{i}", rating=3,
                                      session_id=f"s{wid}", response_time_s=0.1)
                    db.cache_put(f"h{wid}-{i}", "q", {"a": i})
                    db.cache_get(f"h{wid}-{i}")
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(w,)) for w in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        assert db.performance_summary()["total_queries"] == 120

    def test_concurrent_engine_queries(self, tmp_path):
        from financial_rag_tpu.engine import RAGEngine
        from financial_rag_tpu.ingest.pipeline import IngestionPipeline
        from financial_rag_tpu.models.encoder import DualEncoder
        from financial_rag_tpu.models.hashing import HashingEncoder
        from financial_rag_tpu.retrieval.hybrid import HybridRetriever
        from financial_rag_tpu.store import ChildMetaStore, ParentStore

        enc = DualEncoder({"a": HashingEncoder(dim=64)})
        indexes = {"a": FlatIndex(dim=64, capacity=1024)}
        ps, cm = ParentStore(tmp_path / "p.db"), ChildMetaStore(tmp_path / "c.db")
        pipe = IngestionPipeline(enc, ps, cm, indexes)
        f = tmp_path / "d.json"
        f.write_text(json.dumps({"blocks": [
            {"content": "the rent is 42800 rupees per month for the second year. " * 10,
             "page": 0}]}))
        pipe.ingest_extracted_json(f, "doc")
        engine = RAGEngine(HybridRetriever(enc, indexes, cm), ps)

        results, errors = [], []

        def q(i):
            try:
                results.append(engine.query(f"rent amount variant {i}"))
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=q, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        assert all(r["success"] for r in results)


class TestFailureDegradation:
    def test_llm_exception_degrades_each_hook(self):
        """Every LLM touchpoint must survive a provider that raises."""
        llm = _ExplodingLLM()
        assert normalize_query(llm, "what is rent") == ["what is rent"] or True
        # normalize_query lets exceptions escape? It must not:
        try:
            out = normalize_query(llm, "what is rent")
        except ConnectionError:
            pytest.fail("normalize_query leaked provider exception")
        assert out == ["what is rent"]

        try:
            ans = synthesize_answer(llm, "q", [{"content": "ctx one"}])
        except ConnectionError:
            pytest.fail("synthesize_answer leaked provider exception")
        assert "ctx one" in ans

        try:
            ctx = chunk_context(llm, "doc", "chunk")
        except ConnectionError:
            pytest.fail("chunk_context leaked provider exception")
        assert ctx is None

    @pytest.mark.smoke
    def test_llm_none_returns_fallbacks(self):
        llm = _NoneLLM()
        assert normalize_query(llm, "q") == ["q"]
        assert "No relevant context" in synthesize_answer(llm, "q", [])
        assert chunk_context(llm, "d", "c") is None

    def test_engine_error_becomes_answer(self, tmp_path):
        from financial_rag_tpu.engine import RAGEngine
        from financial_rag_tpu.store import ParentStore

        class BrokenHybrid:
            indexes = {}

            def retrieve_children(self, *a, **k):
                raise RuntimeError("index exploded")

        engine = RAGEngine(BrokenHybrid(), ParentStore(tmp_path / "p.db"))
        out = engine.query("anything")
        assert out["success"] is False
        assert "index exploded" in out["answer"]

    def test_ingest_isolates_bad_files(self, tmp_path):
        from financial_rag_tpu.index import FlatIndex as FI
        from financial_rag_tpu.ingest.pipeline import IngestionPipeline
        from financial_rag_tpu.models.encoder import DualEncoder
        from financial_rag_tpu.models.hashing import HashingEncoder
        from financial_rag_tpu.store import ChildMetaStore, ParentStore

        enc = DualEncoder({"a": HashingEncoder(dim=32)})
        pipe = IngestionPipeline(enc, ParentStore(tmp_path / "p.db"),
                                 ChildMetaStore(tmp_path / "c.db"),
                                 {"a": FI(dim=32, capacity=1024)})
        d = tmp_path / "in"
        d.mkdir()
        (d / "bad.json").write_text("{broken")
        (d / "good.json").write_text(json.dumps(
            {"blocks": [{"content": "valid content for ingestion here. " * 10, "page": 0}]}))
        results = pipe.ingest_directory(d)
        by_id = {r["document_id"]: r for r in results}
        assert "error" in by_id["bad"]
        assert by_id["good"]["children"] >= 1


class TestAnalyticsExtras:
    def test_session_journeys_and_transitions(self, tmp_path):
        db = FeedbackDatabase(tmp_path / "f.db")
        db.store_feedback(query="q1", session_id="s1", strategy="Specific")
        db.store_feedback(query="q2", session_id="s1", strategy="Aggregation")
        db.store_feedback(query="q3", session_id="s1", strategy="Aggregation")
        db.store_feedback(query="qx", session_id="s2", strategy="Specific")
        j = db.session_journeys()
        assert j["s1"] == ["q1", "q2", "q3"]
        t = db.strategy_transitions()
        assert t["Specific->Aggregation"] == 1
        assert t["Aggregation->Aggregation"] == 1
        assert "Specific->Specific" not in t


class TestRoundThreePrimitives:
    def test_pipelined_sweep_order_and_overlap(self):
        """finish(N) runs after begin(N+1) (the overlap contract) and every
        begun item is finished exactly once, in order."""
        from financial_rag_tpu.ingest.pipeline import pipelined_sweep

        events = []
        def begin(i):
            events.append(("begin", i))
            return None if i == 2 else f"p{i}"   # item 2: empty/failed
        def finish(i, pending):
            events.append(("finish", i, pending))

        pipelined_sweep([0, 1, 2, 3], begin, finish)
        assert events == [
            ("begin", 0),
            ("begin", 1), ("finish", 0, "p0"),
            ("begin", 2), ("finish", 1, "p1"),
            ("begin", 3),                       # 2 returned None: no finish
            ("finish", 3, "p3"),
        ]

    def test_split_by_groups(self):
        from financial_rag_tpu.serving.batcher import split_by_groups

        flat = list(range(10))
        groups = [[1, 2], [3], [4, 5, 6]]
        out = split_by_groups(groups, lambda lo, hi: flat[lo:hi])
        assert out == [[0, 1], [2], [3, 4, 5]]
        out2 = split_by_groups([{"a": [1, 2]}, {"a": [3]}],
                               lambda lo, hi: (lo, hi),
                               size=lambda g: len(g["a"]))
        assert out2 == [(0, 2), (2, 3)]

    def test_concurrent_atomic_savez_never_corrupts(self, tmp_path):
        """Two writers checkpointing the same path concurrently: the
        published file is always ONE writer's complete archive (the fixed
        tmp filename used to interleave both writers into one file)."""
        import threading

        import numpy as np

        from financial_rag_tpu.index.persist import atomic_savez

        path = tmp_path / "ckpt.npz"
        errs = []
        def writer(tag):
            try:
                for _ in range(10):
                    atomic_savez(path, data=np.full((512, 64), tag, np.float32))
            except Exception as e:  # noqa: BLE001
                errs.append(e)
        ts = [threading.Thread(target=writer, args=(t,)) for t in (1.0, 2.0)]
        for t in ts: t.start()
        for t in ts: t.join()
        assert not errs
        data = np.load(path)["data"]
        assert data.shape == (512, 64)
        assert len(np.unique(data)) == 1 and data[0, 0] in (1.0, 2.0)

    @pytest.mark.smoke
    def test_active_count(self):
        from financial_rag_tpu.serving.batcher import ActiveCount

        g = ActiveCount()
        assert g.value() == 0
        assert g.enter() == 1
        assert g.enter() == 2
        g.leave()
        assert g.value() == 1
        g.leave()
        assert g.value() == 0


class TestChildMetaGenProtocol:
    """The TTL-less memory mirror must never be repopulated with pre-commit
    rows by a reader racing a write (the _gen protocol). delete_document is
    on the serving-churn hot path now — ingest_finish purges old children on
    every re-ingest and blue/green replace — so it must participate too."""

    def _store(self, tmp_path):
        from financial_rag_tpu.store import ChildMetaStore

        cs = ChildMetaStore(tmp_path / "c.db")
        cs.upsert_children([{"child_id": 1, "parent_id": 10, "document_id": "d",
                             "snippet": "old"}])
        return cs

    def test_delete_document_bumps_gen_and_clears_mirror(self, tmp_path):
        cs = self._store(tmp_path)
        cs.get_children([1])                       # mirrors the row
        assert 1 in cs._mem
        g0 = cs._gen
        cs.delete_document("d")
        assert cs._gen == g0 + 2, "delete must bump _gen before AND after"
        assert not cs._mem
        assert cs.get_children([1]) == {}

    def test_reader_racing_delete_cannot_poison_the_mirror(self, tmp_path):
        """Simulate the exact window: a reader captured _gen before the
        delete started; its SELECT may still see the pre-delete row, but
        the gen mismatch must keep it OUT of the mirror."""
        cs = self._store(tmp_path)
        gen0 = cs._gen
        cs.delete_document("d")                    # write completes mid-read
        # reader logic (get_children's mirror condition) with its stale gen0
        assert cs._gen != gen0
        # end-to-end: a fresh read serves the DB truth, not a stale mirror
        assert cs.get_children([1]) == {}
        assert 1 not in cs._mem

    def test_concurrent_delete_and_read_converge(self, tmp_path):
        from financial_rag_tpu.store import ChildMetaStore

        cs = ChildMetaStore(tmp_path / "c.db")
        rows = [{"child_id": i, "parent_id": 1, "document_id": "d",
                 "snippet": f"s{i}"} for i in range(1, 65)]
        cs.upsert_children(rows)
        errs = []

        def reader():
            try:
                for _ in range(200):
                    cs.get_children(list(range(1, 65)))
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        def deleter():
            try:
                cs.delete_document("d")
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=reader) for _ in range(4)] + \
             [threading.Thread(target=deleter)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        # after the dust settles: no resurrected rows via the mirror
        assert cs.get_children(list(range(1, 65))) == {}
        assert not cs._mem
