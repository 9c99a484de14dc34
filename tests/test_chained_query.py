"""Device-chained raw-lane query path (retrieval/hybrid.py
_dense_results_chained): encoder outputs feed the index sweeps as device
arrays and the sweep results + query vectors come back in one device_get.

Covers: parity with the host-handoff path, cache fill from the combined
pull, the cached-all fast path, the BatchingEncoder device-out passthrough,
and collect(extra=...).
"""

import json

import jax
import numpy as np
import pytest

from financial_rag_tpu.config import ModelConfig
from financial_rag_tpu.index import FlatIndex
from financial_rag_tpu.index.pending import collect, ready
from financial_rag_tpu.ingest.pipeline import IngestionPipeline, collection_slug
from financial_rag_tpu.models.checkpoint import random_params
from financial_rag_tpu.models.encoder import DualEncoder, Encoder
from financial_rag_tpu.retrieval.hybrid import HybridRetriever
from financial_rag_tpu.store import ChildMetaStore, ParentStore
from financial_rag_tpu.utils.embed_cache import EmbeddingCache


def _tiny_encoder(seed: int) -> Encoder:
    cfg = ModelConfig(name=f"tiny-{seed}", hidden_size=128, num_layers=2,
                      num_heads=4, intermediate_size=256, vocab_size=30522,
                      max_position=512)
    return Encoder(cfg, random_params(cfg, seed=seed), pooling="mean")


@pytest.fixture(scope="module")
def encoders():
    return {"baai": _tiny_encoder(0), "gte": _tiny_encoder(1)}


@pytest.fixture
def stack(tmp_path, encoders):
    """Fully-ingested stack with REAL (random-param) jitted encoders, so
    the device_out path carries genuine jax.Arrays even on CPU."""
    enc = DualEncoder(dict(encoders), cache=EmbeddingCache(max_items=64))
    indexes = {n: FlatIndex(dim=128, capacity=256, name=collection_slug(n))
               for n in enc.names}
    parent_store = ParentStore(tmp_path / "p.db")
    child_meta = ChildMetaStore(tmp_path / "c.db")
    pipe = IngestionPipeline(enc, parent_store, child_meta, indexes)
    docs = {
        "lease": "The rent for the second year is Rs 42,800 per month. "
                 "The lock-in period is 36 months. " * 3,
        "invoice": "The GST amount charged is Rs 18,000 at 18 percent. " * 3,
    }
    for doc_id, text in docs.items():
        p = tmp_path / f"{doc_id}.json"
        p.write_text(json.dumps({"blocks": [{"content": text, "page": 0}]}))
        pipe.ingest_extracted_json(p, doc_id)
    return enc, indexes, child_meta


class _HostOnlyIndex:
    """Delegate WITHOUT accepts_device_queries/supports_search_begin:
    forces the host-handoff branch for the parity check."""

    supports_search_begin = False
    accepts_device_queries = False

    def __init__(self, inner):
        self.inner = inner

    def search(self, q, k):
        return self.inner.search(np.asarray(q, np.float32), k)

    def count(self):
        return self.inner.count()


class TestChainedQueryPath:
    @pytest.mark.smoke
    def test_parity_with_host_handoff(self, stack):
        enc, indexes, child_meta = stack
        q = "What is the GST amount on the invoice?"
        chained = HybridRetriever(enc, indexes, child_meta)
        host = HybridRetriever(
            DualEncoder(dict(enc.encoders)),  # no cache: pure host encode
            {n: _HostOnlyIndex(i) for n, i in indexes.items()}, child_meta)
        enc.cache.clear() if hasattr(enc.cache, "clear") else None
        a, _, _ = chained.retrieve_children(q)
        b, _, _ = host.retrieve_children(q)
        assert [c["child_id"] for c in a] == [c["child_id"] for c in b]
        np.testing.assert_allclose([c["retrieval_score"] for c in a],
                                   [c["retrieval_score"] for c in b], rtol=1e-5)

    def test_cache_filled_from_combined_pull(self, stack):
        enc, indexes, child_meta = stack
        h = HybridRetriever(enc, indexes, child_meta)
        q = "lock-in period months"
        assert enc.cached_all([q]) is None
        first, _, _ = h.retrieve_children(q)
        cached = enc.cached_all([q])
        assert cached is not None and set(cached) == set(enc.names)
        # second call runs entirely off the cache: encoding would blow up
        orig = enc.encode_all_begin
        enc.encode_all_begin = lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("re-encoded a fully cached query"))
        try:
            second, _, _ = h.retrieve_children(q)
        finally:
            enc.encode_all_begin = orig
        assert [c["child_id"] for c in first] == [c["child_id"] for c in second]
        # cached vectors match a fresh host encode (same forward)
        fresh = DualEncoder(dict(enc.encoders)).encode_all([q])
        for name in enc.names:
            np.testing.assert_allclose(cached[name], fresh[name],
                                       rtol=1e-4, atol=1e-5)

    def test_cached_all_contract(self, stack):
        enc, _, _ = stack
        assert enc.cached_all([]) is None
        enc.cache.put("baai", "t1", np.ones(128, np.float32))
        assert enc.cached_all(["t1"]) is None  # gte still missing
        enc.cache.put("gte", "t1", np.ones(128, np.float32))
        got = enc.cached_all(["t1"])
        assert got is not None and got["baai"].shape == (1, 128)
        assert enc.cached_all(["t1", "t-missing"]) is None


class TestBatchingEncoderDeviceOut:
    def test_direct_lane_hands_out_device_arrays(self, encoders):
        from financial_rag_tpu.serving.batcher import BatchingEncoder

        be = BatchingEncoder(encoders["baai"], direct=8, name="t-dev")
        try:
            out = be.encode_begin_device(["hello world"])()
            assert isinstance(out, jax.Array) and out.shape == (1, 128)
        finally:
            be.batcher.close()

    def test_no_direct_lane_falls_back_to_host(self, encoders):
        from financial_rag_tpu.serving.batcher import BatchingEncoder

        be = BatchingEncoder(encoders["baai"], direct=0, name="t-host")
        try:
            out = be.encode_begin_device(["hello world"])()
            assert isinstance(out, np.ndarray) and out.shape == (1, 128)
        finally:
            be.batcher.close()


class TestCollectExtra:
    def test_extra_rides_the_same_transfer(self):
        import jax.numpy as jnp

        p = ready(np.array([[1]], np.int64), np.array([[0.5]], np.float32))
        extra_dev = [jnp.arange(4.0)]
        results, extra_host = collect([p], extra=extra_dev)
        assert results[0][0][0, 0] == 1
        np.testing.assert_array_equal(np.asarray(extra_host[0]),
                                      np.arange(4.0, dtype=np.float32))


class TestChainedWaveLane:
    """Device-chained COALESCED waves (VERDICT r3 #2): above the direct
    limit, concurrent requests' query texts coalesce into one wave that
    tokenizes once, runs one pinned-shape encode per model, feeds the
    device embeddings straight into every index sweep, and materializes
    everything (results + cache-fill vectors) in ONE combined device_get."""

    def _batcher(self, enc, indexes, **kw):
        from financial_rag_tpu.serving.batcher import MultiIndexBatcher

        return MultiIndexBatcher(indexes, max_queries=16,
                                 chain_encoder=enc, **kw)

    def test_supports_chained_waves_gating(self, stack):
        enc, indexes, _ = stack
        assert self._batcher(enc, indexes).supports_chained_waves()
        # no chain encoder -> no
        from financial_rag_tpu.serving.batcher import MultiIndexBatcher
        assert not MultiIndexBatcher(indexes).supports_chained_waves()
        # host-only index -> no
        host_idx = {n: _HostOnlyIndex(i) for n, i in indexes.items()}
        assert not self._batcher(enc, host_idx).supports_chained_waves()
        # host-side encoder -> no
        from financial_rag_tpu.models.hashing import HashingEncoder
        hash_enc = DualEncoder({"baai": HashingEncoder(dim=128, salt=1),
                                "gte": HashingEncoder(dim=128, salt=2)})
        assert not self._batcher(hash_enc, indexes).supports_chained_waves()

    def test_concurrent_waves_match_per_request_search(self, stack):
        import threading

        enc, indexes, _ = stack
        mib = self._batcher(DualEncoder(dict(enc.encoders)), indexes)
        queries = [["what is the monthly rent amount"],
                   ["GST amount charged", "lock-in period months"],
                   ["lessor name on the lease"],
                   ["tax invoice total"]]
        barrier = threading.Barrier(len(queries))
        results = [None] * len(queries)
        errors = []

        def run(i):
            try:
                barrier.wait()
                results[i] = mib.search_texts(queries[i], 4)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        ts = [threading.Thread(target=run, args=(i,)) for i in range(len(queries))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errors
        st = mib.stats()
        assert st["chained@k4"]["submitted"] == 4

        fresh = DualEncoder(dict(enc.encoders))
        for i, qs in enumerate(queries):
            vecs = fresh.encode_all(qs)
            for name, idx in indexes.items():
                want_ids, want_sc = idx.search(vecs[name], 4)
                got_ids, got_sc = results[i][name]
                np.testing.assert_array_equal(got_ids, want_ids)
                np.testing.assert_allclose(got_sc, want_sc, rtol=1e-4, atol=1e-5)

    def test_wave_fills_the_embedding_cache(self, stack):
        from financial_rag_tpu.utils.embed_cache import EmbeddingCache

        enc, indexes, _ = stack
        chain = DualEncoder(dict(enc.encoders), cache=EmbeddingCache(max_items=64))
        mib = self._batcher(chain, indexes)
        q = "rent for the second year"
        assert chain.cached_all([q]) is None
        mib.search_texts([q], 4)
        cached = chain.cached_all([q])
        assert cached is not None
        fresh = DualEncoder(dict(enc.encoders)).encode_all([q])
        for name in chain.names:
            np.testing.assert_allclose(cached[name], fresh[name],
                                       rtol=1e-4, atol=1e-5)

    def test_hybrid_routes_through_the_chained_wave(self, stack):
        enc, indexes, child_meta = stack
        mib = self._batcher(DualEncoder(dict(enc.encoders)), indexes)
        h = HybridRetriever(enc, indexes, child_meta, sweep_batcher=mib)
        baseline = HybridRetriever(enc, indexes, child_meta)
        q = "What is the GST amount on the invoice?"
        a, _, _ = h.retrieve_children(q)
        b, _, _ = baseline.retrieve_children(q)
        assert [c["child_id"] for c in a] == [c["child_id"] for c in b]
        np.testing.assert_allclose([c["retrieval_score"] for c in a],
                                   [c["retrieval_score"] for c in b], rtol=1e-5)
        st = mib.stats()
        chained = [v for k, v in st.items() if k.startswith("chained@")]
        assert chained and chained[0]["calls"] >= 1
        assert not any(v["calls"] for k, v in st.items()
                       if not k.startswith("chained@"))

    def test_hybrid_hot_query_skips_the_wave_encode(self, stack):
        """A repeated query whose embeddings are already in the query cache
        must NOT re-encode on device: the hybrid retriever routes it through
        the vector (search_all) wave instead of the chained encode wave."""
        from financial_rag_tpu.utils.embed_cache import EmbeddingCache

        enc, indexes, child_meta = stack
        # runtime wiring: the retriever's dual_encoder and the batcher's
        # chain encoder SHARE one EmbeddingCache (runtime.py)
        cache = EmbeddingCache(max_items=64)
        dual = DualEncoder(dict(enc.encoders), cache=cache)
        chain = DualEncoder(dict(enc.encoders), cache=cache)
        mib = self._batcher(chain, indexes)
        h = HybridRetriever(dual, indexes, child_meta, sweep_batcher=mib)
        q = "What is the GST amount on the invoice?"
        first, _, _ = h.retrieve_children(q)     # cold: chained wave, fills cache
        st = mib.stats()
        chained_before = sum(v["calls"] for k, v in st.items()
                             if k.startswith("chained@"))
        assert chained_before >= 1
        second, _, _ = h.retrieve_children(q)    # hot: cache hit, vector wave
        st = mib.stats()
        chained_after = sum(v["calls"] for k, v in st.items()
                            if k.startswith("chained@"))
        assert chained_after == chained_before   # no second device encode
        vector_calls = sum(v["calls"] for k, v in st.items()
                           if not k.startswith("chained@"))
        assert vector_calls >= 1
        assert [c["child_id"] for c in second] == [c["child_id"] for c in first]

    def test_warmup_compiles_chained_shapes(self, stack):
        enc, indexes, _ = stack
        mib = self._batcher(DualEncoder(dict(enc.encoders)), indexes)
        mib.warmup(4)   # must not raise; covers vector + chained programs
        # the warmed path serves correctly afterwards
        got = mib.search_texts(["monthly rent"], 4)
        assert set(got) == set(indexes) and got["baai"][0].shape == (1, 4)

    def test_long_query_wave_picks_a_covering_seq_bucket(self, stack):
        """A wave containing one long query must not truncate it: the
        pinned bucket covers the wave's longest text."""
        enc, indexes, _ = stack
        mib = self._batcher(DualEncoder(dict(enc.encoders)), indexes)
        long_q = "the total amount due including all taxes and fees " * 12
        got = mib.search_texts([long_q], 4)
        fresh = DualEncoder(dict(enc.encoders)).encode_all([long_q])
        for name, idx in indexes.items():
            want_ids, want_sc = idx.search(fresh[name], 4)
            np.testing.assert_array_equal(got[name][0], want_ids)
            np.testing.assert_allclose(got[name][1], want_sc, rtol=1e-4, atol=1e-5)
