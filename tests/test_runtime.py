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
    @pytest.mark.smoke
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

    def test_sharded_persist_and_reload(self, tmp_path, monkeypatch,
                                        reference_fixture_json):
        """INDEX_SHARDS>1 restart: the persisted sharded index must be
        reloaded (round 1 silently rebuilt empty while the ledger said
        'embedded' — retrieval returned nothing after restart)."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        monkeypatch.setenv("INDEX_SHARDS", "8")
        rt = Runtime.build(data_dir=tmp_path)
        src = tmp_path / "cn.json"
        src.write_text(json.dumps(reference_fixture_json))
        rt.pipeline.ingest_extracted_json(src, "cn22-23")
        counts = {n: i.count() for n, i in rt.indexes.items()}
        assert all(c > 0 for c in counts.values())
        rt.save_indexes(tmp_path)

        rt2 = Runtime.build(data_dir=tmp_path)
        from financial_rag_tpu.parallel.sharded_index import ShardedFlatIndex

        assert all(isinstance(i, ShardedFlatIndex) for i in rt2.indexes.values())
        assert {n: i.count() for n, i in rt2.indexes.items()} == counts
        out = rt2.engine.query("credit note number")
        assert out["success"] and out["top_children_chunks"]

    def test_flat_checkpoint_loads_into_sharded_mode(self, tmp_path, monkeypatch,
                                                     reference_fixture_json):
        """Switching INDEX_SHARDS on must keep the existing flat corpus."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        rt = Runtime.build(data_dir=tmp_path)
        src = tmp_path / "cn.json"
        src.write_text(json.dumps(reference_fixture_json))
        rt.pipeline.ingest_extracted_json(src, "cn22-23")
        counts = {n: i.count() for n, i in rt.indexes.items()}
        rt.save_indexes(tmp_path)

        monkeypatch.setenv("INDEX_SHARDS", "8")
        rt2 = Runtime.build(data_dir=tmp_path)
        assert {n: i.count() for n, i in rt2.indexes.items()} == counts
        out = rt2.engine.query("credit note number")
        assert out["success"] and out["top_children_chunks"]

    def test_sharded_ivf_mode(self, tmp_path, monkeypatch, reference_fixture_json):
        """INDEX_KIND=ivf + INDEX_SHARDS>1 composes to ShardedIVFIndex (the
        10M-chunk configuration, BASELINE configs[4]) with streaming
        ingest-then-search and persistence."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        monkeypatch.setenv("INDEX_KIND", "ivf")
        monkeypatch.setenv("INDEX_SHARDS", "8")
        monkeypatch.setenv("IVF_NLIST", "4")
        monkeypatch.setenv("IVF_NPROBE", "4")
        rt = Runtime.build(data_dir=tmp_path)
        from financial_rag_tpu.parallel.sharded_ivf import ShardedIVFIndex

        assert all(isinstance(i, ShardedIVFIndex) for i in rt.indexes.values())
        src = tmp_path / "cn.json"
        src.write_text(json.dumps(reference_fixture_json))
        rt.pipeline.ingest_extracted_json(src, "cn22-23")
        out = rt.engine.query("credit note number")
        assert out["success"] and out["top_children_chunks"]

        # streaming regime: more ingest AFTER a search must be searchable
        src2 = tmp_path / "extra.json"
        src2.write_text(json.dumps({"blocks": [
            {"content": "The warehouse lease deposit equals 7,77,777 rupees. " * 12,
             "page": 0}]}))
        rt.pipeline.ingest_extracted_json(src2, "extra")
        out = rt.engine.query("warehouse lease deposit")
        assert out["success"]
        assert any("7,77,777" in c["text"] for c in out["top_children_chunks"])

        counts = {n: i.count() for n, i in rt.indexes.items()}
        rt.save_indexes(tmp_path)
        rt2 = Runtime.build(data_dir=tmp_path)
        assert all(isinstance(i, ShardedIVFIndex) for i in rt2.indexes.values())
        assert {n: i.count() for n, i in rt2.indexes.items()} == counts

    def test_int8_persist_and_reload(self, tmp_path, monkeypatch,
                                     reference_fixture_json):
        """int8 index restart: reload must restore int8 storage (round 1
        reloaded ±127 payloads into a bf16 index, mis-scaling every score
        and burying post-restart upserts ~127x below old vectors)."""
        import jax.numpy as jnp
        import numpy as np

        monkeypatch.setenv("INDEX_DTYPE", "int8")
        rt = Runtime.build(data_dir=tmp_path)
        src = tmp_path / "cn.json"
        src.write_text(json.dumps(reference_fixture_json))
        rt.pipeline.ingest_extracted_json(src, "cn22-23")
        q = rt.dual_encoder.encoders["baai"].encode(["credit note number"])
        ids_before, scores_before = rt.indexes["baai"].search(q, 3)
        rt.save_indexes(tmp_path)

        rt2 = Runtime.build(data_dir=tmp_path)
        assert all(i.dtype == jnp.int8 for i in rt2.indexes.values())
        ids_after, scores_after = rt2.indexes["baai"].search(q, 3)
        np.testing.assert_array_equal(ids_before, ids_after)
        np.testing.assert_allclose(scores_before, scores_after, atol=2e-2)
        # old and new vectors live on the same scale: a fresh upsert of the
        # exact query vector must win immediately
        rt2.indexes["baai"].upsert([123456789], q)
        ids, scores = rt2.indexes["baai"].search(q, 1)
        assert ids[0, 0] == 123456789 and scores[0, 0] > 0.98

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

    def test_ivf_int8_mode_with_persist(self, tmp_path, monkeypatch,
                                        reference_fixture_json):
        """INDEX_KIND=ivf + INDEX_DTYPE=int8 composes (per-vector dequant
        weights in the IVF validity array), and survives a restart."""
        import jax.numpy as jnp
        import numpy as np

        monkeypatch.setenv("INDEX_KIND", "ivf")
        monkeypatch.setenv("INDEX_DTYPE", "int8")
        monkeypatch.setenv("IVF_NLIST", "4")
        monkeypatch.setenv("IVF_NPROBE", "4")
        rt = Runtime.build(data_dir=tmp_path)
        from financial_rag_tpu.index import IVFIndex

        assert all(isinstance(i, IVFIndex) and i.dtype == jnp.int8
                   for i in rt.indexes.values())
        src = tmp_path / "cn.json"
        src.write_text(json.dumps(reference_fixture_json))
        rt.pipeline.ingest_extracted_json(src, "cn22-23")  # auto-trains
        out = rt.engine.query("credit note number")
        assert out["success"] and out["top_children_chunks"]

        q = rt.dual_encoder.encoders["baai"].encode(["credit note number"])
        ids_before, scores_before = rt.indexes["baai"].search(q, 3)
        rt.save_indexes(tmp_path)

        rt2 = Runtime.build(data_dir=tmp_path)
        assert all(i.dtype == jnp.int8 for i in rt2.indexes.values())
        ids_after, scores_after = rt2.indexes["baai"].search(q, 3)
        np.testing.assert_array_equal(ids_before, ids_after)
        np.testing.assert_allclose(scores_before, scores_after, atol=2e-2)

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


def test_admin_save_persists_indexes(tmp_path, monkeypatch, reference_fixture_json):
    """POST /admin/save writes index checkpoints on demand; a fresh
    runtime reloads them (explicit checkpoint before shutdown)."""
    import json as json_mod

    from werkzeug.test import Client

    from financial_rag_tpu.runtime import Runtime

    monkeypatch.chdir(tmp_path)
    rt = Runtime.build(data_dir=tmp_path)
    src = tmp_path / "doc.json"
    src.write_text(json_mod.dumps(reference_fixture_json))
    rt.pipeline.ingest_extracted_json(src, "doc1")

    client = Client(rt.make_app(data_dir=tmp_path))
    r = client.post("/admin/save")
    assert r.status_code == 200 and r.get_json()["status"] == "saved"

    persist = tmp_path / rt.config.index.persist_dir
    assert any(persist.glob("*.npz")), "no checkpoint written"
    rt2 = Runtime.build(data_dir=tmp_path)
    assert all(idx.count() == rt.indexes[n].count()
               for n, idx in rt2.indexes.items())

    # without a hook (bare create_app) the endpoint 404s
    from financial_rag_tpu.serving.app import create_app

    bare = Client(create_app(rt.engine))
    assert bare.post("/admin/save").status_code == 404
