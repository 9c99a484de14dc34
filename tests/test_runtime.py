"""Runtime factory: full-stack assembly, persistence reload, golden-question
flow through the assembled engine (fallback encoders, no LLM)."""

import json

import pytest

from financial_rag_tpu.runtime import Runtime


@pytest.fixture
def built(tmp_path, reference_fixture_json):
    rt = Runtime.build(data_dir=tmp_path)
    src = tmp_path / "cn22-23.json"
    src.write_text(json.dumps(reference_fixture_json))
    rt.pipeline.ingest_extracted_json(src, "cn22-23", source_path=str(src),
                                      source_mtime=src.stat().st_mtime)
    return rt, tmp_path


class TestRuntime:
    def test_build_with_fallback_encoders(self, built):
        rt, tmp_path = built
        assert set(rt.indexes) == {"baai", "gte"}
        assert rt.parent_store.count() >= 1
        out = rt.engine.query("credit note number")
        assert out["success"]
        assert out["top_children_chunks"]

    def test_persist_and_reload(self, built):
        rt, tmp_path = built
        counts = {n: i.count() for n, i in rt.indexes.items()}
        rt.save_indexes(tmp_path)
        rt2 = Runtime.build(data_dir=tmp_path)
        assert {n: i.count() for n, i in rt2.indexes.items()} == counts
        out = rt2.dense_retriever.query("tax invoice credit note", top_k=3)
        assert out["child_hits"]

    def test_sharded_index_mode(self, tmp_path, monkeypatch, reference_fixture_json):
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        monkeypatch.setenv("INDEX_SHARDS", "8")
        rt = Runtime.build(data_dir=tmp_path)
        from financial_rag_tpu.parallel.sharded_index import ShardedFlatIndex

        assert all(isinstance(i, ShardedFlatIndex) for i in rt.indexes.values())
        src = tmp_path / "cn.json"
        src.write_text(json.dumps(reference_fixture_json))
        rt.pipeline.ingest_extracted_json(src, "cn22-23")
        out = rt.engine.query("credit note number")
        assert out["success"] and out["top_children_chunks"]

    def test_ivf_mode(self, tmp_path, monkeypatch, reference_fixture_json):
        monkeypatch.setenv("INDEX_KIND", "ivf")
        monkeypatch.setenv("IVF_NLIST", "4")
        monkeypatch.setenv("IVF_NPROBE", "4")
        rt = Runtime.build(data_dir=tmp_path)
        from financial_rag_tpu.index import IVFIndex

        assert all(isinstance(i, IVFIndex) for i in rt.indexes.values())
        src = tmp_path / "cn.json"
        src.write_text(json.dumps(reference_fixture_json))
        rt.pipeline.ingest_extracted_json(src, "cn22-23")  # auto-trains
        out = rt.engine.query("credit note number")
        assert out["success"] and out["top_children_chunks"]

    def test_int8_mode(self, tmp_path, monkeypatch, reference_fixture_json):
        import jax.numpy as jnp

        monkeypatch.setenv("INDEX_DTYPE", "int8")
        rt = Runtime.build(data_dir=tmp_path)
        assert all(i.dtype == jnp.int8 for i in rt.indexes.values())
        src = tmp_path / "cn.json"
        src.write_text(json.dumps(reference_fixture_json))
        rt.pipeline.ingest_extracted_json(src, "cn22-23")
        out = rt.engine.query("credit note number")
        assert out["success"] and out["top_children_chunks"]

    def test_processor_persists_indexes_for_new_process(self, tmp_path):
        """Server-side ingest must be visible to a fresh Runtime (found in
        verification: the reference's Chroma persisted implicitly; our
        indexes need the sweep-complete save hook)."""
        src = tmp_path / "Source_Documents"
        src.mkdir()
        (src / "doc.json").write_text(json.dumps({"blocks": [
            {"content": "The revised total amount is Rs 9,99,999. " * 10, "page": 0}]}))
        rt = Runtime.build(data_dir=tmp_path)
        processor = rt.make_processor(tmp_path)
        out = processor.process_all()
        assert out["processed"]

        rt2 = Runtime.build(data_dir=tmp_path)  # fresh process equivalent
        assert all(i.count() > 0 for i in rt2.indexes.values())
        res = rt2.engine.query("what is the revised total amount")
        assert "9,99,999" in res["answer"]

    def test_make_app_and_processor(self, built):
        from werkzeug.test import Client

        rt, tmp_path = built
        (tmp_path / "Source_Documents").mkdir(exist_ok=True)
        processor = rt.make_processor(tmp_path)
        app = rt.make_app(processor=processor, data_dir=tmp_path)
        client = Client(app)
        assert client.get("/health").get_json()["status"] == "healthy"
        resp = client.post("/search", json={"query": "credit note"})
        assert resp.status_code == 200
