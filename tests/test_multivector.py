"""Multi-vector MaxSim index: exactness vs a numpy oracle and retrieval
quality with lexical token embeddings."""

import numpy as np
import pytest

from financial_rag_tpu.index import MultiVectorIndex
from financial_rag_tpu.models.hashing import HashingEncoder


def _np_maxsim(qv, token_store, masks):
    """Oracle: sum_q max_t (q . tokens[c, t]) with masked tokens at -inf."""
    scores = []
    for toks, m in zip(token_store, masks):
        sims = qv @ toks.T  # [Tq, Tc]
        sims[:, m == 0] = -np.inf
        scores.append(sims.max(axis=1).sum())
    return np.asarray(scores)


class TestMultiVectorIndex:
    @pytest.mark.smoke
    def test_exact_maxsim_vs_oracle(self, rng):
        d, tc, n, tq, k = 64, 16, 200, 5, 10
        token_counts = rng.integers(3, tc, n)
        token_store, masks, vecs_list = [], [], []
        for c in token_counts:
            v = rng.standard_normal((c, d)).astype(np.float32)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            vecs_list.append(v)
            padded = np.zeros((tc, d), np.float32)
            padded[:c] = v
            m = np.zeros(tc, np.float32)
            m[:c] = 1
            token_store.append(padded)
            masks.append(m)

        idx = MultiVectorIndex(dim=d, max_child_tokens=tc, capacity=256,
                               dtype=np.float32, chunk=64)
        ids = np.arange(10, 10 + n, dtype=np.int64)
        idx.upsert(ids, vecs_list)
        assert idx.count() == n

        qv = rng.standard_normal((tq, d)).astype(np.float32)
        qv /= np.linalg.norm(qv, axis=1, keepdims=True)
        hits = idx.search_aggregate(qv, top_k=k)
        got_ids = [h["child_id"] for h in hits]

        oracle = _np_maxsim(qv, token_store, masks)
        ref_ids = ids[np.argsort(-oracle, kind="stable")[:k]].tolist()
        assert got_ids == ref_ids
        np.testing.assert_allclose(
            [h["score"] for h in hits], np.sort(oracle)[::-1][:k], rtol=1e-4)

    def test_retrieval_quality_with_lexical_tokens(self):
        enc = HashingEncoder(dim=96)
        docs = {
            1: "the rent for the second year is 42800 rupees per month",
            2: "gst tax amount charged on the invoice is 18000",
            3: "weather in paris is mild during spring with rain",
        }
        idx = MultiVectorIndex(dim=96, max_child_tokens=32, capacity=64,
                               dtype=np.float32, chunk=64)
        idx.upsert(list(docs.keys()), enc.encode_tokens(list(docs.values())))

        qv = enc.encode_tokens(["what is the gst tax amount"])[0]
        hits = idx.search_aggregate(qv, top_k=3)
        assert hits[0]["child_id"] == 2

    def test_hybrid_with_multivector_tier(self, tmp_path):
        import json

        from financial_rag_tpu.config import RetrievalConfig
        from financial_rag_tpu.index import FlatIndex
        from financial_rag_tpu.ingest.pipeline import IngestionPipeline
        from financial_rag_tpu.models.encoder import DualEncoder
        from financial_rag_tpu.retrieval.hybrid import HybridRetriever
        from financial_rag_tpu.store import ChildMetaStore, ParentStore

        enc = DualEncoder({"baai": HashingEncoder(dim=96, salt=1)})
        tok_enc = HashingEncoder(dim=96, salt=9)
        mv = MultiVectorIndex(dim=96, max_child_tokens=64, capacity=64,
                              dtype=np.float32, chunk=64)
        indexes = {"baai": FlatIndex(dim=96, capacity=1024)}
        pipe = IngestionPipeline(enc, ParentStore(tmp_path / "p.db"),
                                 ChildMetaStore(tmp_path / "c.db"), indexes,
                                 multivector_index=mv, token_encoder=tok_enc)
        src = tmp_path / "d.json"
        src.write_text(json.dumps({"blocks": [
            {"content": "The GST amount charged is Rs 18,000 at 18 percent. " * 8, "page": 0}]}))
        pipe.ingest_extracted_json(src, "doc")
        assert mv.count() > 0

        rc = RetrievalConfig()
        rc.multivector_enabled = True
        h = HybridRetriever(enc, indexes, pipe.child_meta, retrieval_cfg=rc,
                            multivector_index=mv, token_encoder=tok_enc)
        chunks, _, _ = h.retrieve_children("what is the gst amount")
        assert chunks and "GST" in chunks[0]["text"]

    def test_delete(self, rng):
        idx = MultiVectorIndex(dim=32, max_child_tokens=8, capacity=64,
                               dtype=np.float32, chunk=64)
        vs = [rng.standard_normal((4, 32)).astype(np.float32) for _ in range(6)]
        idx.upsert(np.arange(1, 7, dtype=np.int64), vs)
        assert idx.delete([1, 2]) == 2
        assert idx.count() == 4
        q = vs[0] / np.linalg.norm(vs[0], axis=1, keepdims=True)
        hits = idx.search_aggregate(q, top_k=6)
        assert 1 not in [h["child_id"] for h in hits]

    def test_remove_document_cleans_multivector(self, tmp_path):
        import json

        from financial_rag_tpu.index import FlatIndex
        from financial_rag_tpu.ingest.pipeline import IngestionPipeline
        from financial_rag_tpu.models.encoder import DualEncoder
        from financial_rag_tpu.store import ChildMetaStore, ParentStore

        enc = DualEncoder({"a": HashingEncoder(dim=64, salt=1)})
        tok_enc = HashingEncoder(dim=64, salt=9)
        mv = MultiVectorIndex(dim=64, max_child_tokens=32, capacity=64,
                              dtype=np.float32, chunk=64)
        pipe = IngestionPipeline(enc, ParentStore(tmp_path / "p.db"),
                                 ChildMetaStore(tmp_path / "c.db"),
                                 {"a": FlatIndex(dim=64, capacity=1024)},
                                 multivector_index=mv, token_encoder=tok_enc)
        src = tmp_path / "d.json"
        src.write_text(json.dumps({"blocks": [
            {"content": "gst amount is 18000 rupees on the invoice. " * 8, "page": 0}]}))
        pipe.ingest_extracted_json(src, "doc")
        assert mv.count() > 0
        out = pipe.remove_document("doc")
        assert out["vectors_removed"]["multivector"] > 0
        assert mv.count() == 0

    def test_growth_and_overwrite(self, rng):
        idx = MultiVectorIndex(dim=32, max_child_tokens=8, capacity=64,
                               dtype=np.float32, chunk=64)
        vs = [rng.standard_normal((4, 32)).astype(np.float32) for _ in range(100)]
        idx.upsert(np.arange(1, 101, dtype=np.int64), vs)
        assert idx.count() == 100
        assert idx.capacity >= 128
        # overwrite id 1 with opposite vectors
        idx.upsert([1], [-vs[0]])
        assert idx.count() == 100
        q = -vs[0] / np.linalg.norm(-vs[0], axis=1, keepdims=True)
        hits = idx.search_aggregate(q, top_k=1)
        assert hits[0]["child_id"] == 1


class TestTokenEncoderBatched:
    def test_batched_matches_per_text(self):
        """encode_tokens runs length-bucketed batched forwards; results must
        be identical (same ragged shapes, same values) to one-text-at-a-time
        calls — the reference-shaped loop it replaced."""
        from financial_rag_tpu.config import ModelConfig
        from financial_rag_tpu.models.checkpoint import random_params
        from financial_rag_tpu.models.encoder import Encoder, TokenEncoder

        cfg = ModelConfig(name="tiny", hidden_size=64, num_layers=2, num_heads=4,
                          intermediate_size=128, vocab_size=30522,
                          max_position=512, type_vocab_size=2,
                          layer_norm_eps=1e-12)
        enc = Encoder(cfg, random_params(cfg, seed=0), pooling="mean",
                      batch_size=8, max_seq_len=256)
        tok = TokenEncoder(enc, max_tokens=64, batch_size=4)

        texts = [
            "short one",
            "the lock-in period is thirty six months from rent commencement",
            "gst at eighteen percent on the total invoice value of rupees "
            "one lakh eighteen thousand " * 3,
            "a",
            "credit note number and date fields appear on the tax invoice",
            "warehouse lease deposit equals seven lakh rupees",
        ]
        batched = tok.encode_tokens(texts)
        single = [tok.encode_tokens([t])[0] for t in texts]
        assert len(batched) == len(texts)
        for b, s in zip(batched, single):
            assert b.shape == s.shape
            np.testing.assert_allclose(b, s, atol=2e-5)
            # unit-normalized rows
            np.testing.assert_allclose(np.linalg.norm(b, axis=1), 1.0, atol=1e-5)
