"""Flat + IVF index tests vs a numpy exact-search oracle
(SURVEY.md §7.2 step 3: 'exact-search recall@10 must equal a numpy oracle')."""

import numpy as np
import pytest

from financial_rag_tpu.index import FlatIndex, IVFIndex
from financial_rag_tpu.index.ivf import kmeans


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _oracle(q, x, k):
    s = q @ x.T
    order = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return order, np.take_along_axis(s, order, axis=1)


class TestFlatIndex:
    @pytest.mark.smoke
    def test_upsert_search_exact(self, rng):
        d, n, k = 384, 3000, 10
        x = _unit(rng, n, d)
        ids = np.arange(1000, 1000 + n, dtype=np.int64)
        idx = FlatIndex(dim=d, capacity=1024, dtype=np.float32)  # forces growth
        idx.upsert(ids, x)
        assert idx.count() == n

        q = _unit(rng, 5, d)
        got_ids, got_scores = idx.search(q, k)
        order, ref_scores = _oracle(q, x, k)
        np.testing.assert_array_equal(got_ids, ids[order])
        np.testing.assert_allclose(got_scores, ref_scores, atol=1e-5)

    def test_bf16_storage_recall(self):
        rng = np.random.default_rng(42)
        d, n, k = 384, 3000, 10
        x = _unit(rng, n, d)
        ids = np.arange(1, 1 + n, dtype=np.int64)
        idx = FlatIndex(dim=d, capacity=4096)  # default bf16 storage
        idx.upsert(ids, x)
        q = _unit(rng, 8, d)
        got_ids, _ = idx.search(q, k)
        order, _ = _oracle(q, x, k)
        ref = ids[order]
        recall = np.mean([len(set(a.tolist()) & set(b.tolist())) / k
                          for a, b in zip(got_ids, ref)])
        assert recall >= 0.95, recall

    def test_int8_storage_recall(self):
        """int8-quantized corpus: half the HBM stream, near-identical recall."""
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        d, n, k = 384, 3000, 10
        x = _unit(rng, n, d)
        ids = np.arange(1, 1 + n, dtype=np.int64)
        idx = FlatIndex(dim=d, capacity=4096, dtype=jnp.int8)
        idx.upsert(ids, x)
        q = _unit(rng, 8, d)
        got_ids, got_scores = idx.search(q, k)
        order, ref_scores = _oracle(q, x, k)
        ref = ids[order]
        recall = np.mean([len(set(a.tolist()) & set(b.tolist())) / k
                          for a, b in zip(got_ids, ref)])
        assert recall >= 0.9, recall
        # rescaled scores stay in cosine range and track the true scores
        finite = np.isfinite(got_scores)
        assert np.all(got_scores[finite] <= 1.05)
        assert abs(float(got_scores[0, 0]) - float(ref_scores[0, 0])) < 0.05

    def test_overwrite_same_id(self, rng):
        d = 128
        idx = FlatIndex(dim=d, capacity=1024, dtype=np.float32)
        v1 = _unit(rng, 1, d)
        v2 = -v1
        idx.upsert([42], v1)
        idx.upsert([42], v2)
        assert idx.count() == 1
        ids, scores = idx.search(v2, 1)
        assert ids[0, 0] == 42
        assert scores[0, 0] > 0.99

    def test_delete(self, rng):
        d = 128
        x = _unit(rng, 10, d)
        idx = FlatIndex(dim=d, capacity=1024)
        idx.upsert(np.arange(1, 11, dtype=np.int64), x)
        assert idx.delete([1, 2, 3]) == 3
        assert idx.count() == 7
        ids, _ = idx.search(x[0:1], 7)
        assert 1 not in ids and 2 not in ids and 3 not in ids

    def test_compact_reclaims_tombstones(self, rng):
        d = 64
        x = _unit(rng, 20, d)
        idx = FlatIndex(dim=d, capacity=1024, dtype=np.float32)
        idx.upsert(np.arange(1, 21, dtype=np.int64), x)
        idx.delete(list(range(1, 11)))
        assert idx._next_slot == 20
        reclaimed = idx.compact()
        assert reclaimed == 10
        assert idx.count() == 10 and idx._next_slot == 10
        # retrieval identical post-compaction
        ids, scores = idx.search(x[15:16], 3)
        assert ids[0, 0] == 16
        assert scores[0, 0] > 0.999
        # new upserts reuse reclaimed space
        idx.upsert([99], _unit(rng, 1, d))
        assert idx._next_slot == 11

    def test_empty_search(self):
        idx = FlatIndex(dim=64, capacity=1024)
        ids, scores = idx.search(np.ones((2, 64), np.float32), 5)
        assert ids.shape == (2, 5)
        assert np.all(np.isneginf(scores))

    def test_save_load_roundtrip(self, rng, tmp_path):
        d, n = 96, 500
        x = _unit(rng, n, d)
        ids = np.arange(10, 10 + n, dtype=np.int64)
        idx = FlatIndex(dim=d, capacity=1024, name="kids")
        idx.upsert(ids, x)
        idx.delete([10, 11])
        idx.save(tmp_path)

        idx2 = FlatIndex.load(tmp_path, name="kids")
        assert idx2.count() == n - 2
        q = _unit(rng, 3, d)
        a_ids, a_s = idx.search(q, 5)
        b_ids, b_s = idx2.search(q, 5)
        np.testing.assert_array_equal(a_ids, b_ids)

    def test_int8_save_load_restores_dtype_and_scale(self, rng, tmp_path):
        """Manifest dtype drives reload: an int8 index must come back int8
        with identical scores, and a load into a float dtype must rescale
        the ±127 payload back to unit-vector space."""
        import jax.numpy as jnp

        d, n = 96, 400
        x = _unit(rng, n, d)
        ids = np.arange(1, 1 + n, dtype=np.int64)
        idx = FlatIndex(dim=d, capacity=1024, dtype=jnp.int8, name="q8")
        idx.upsert(ids, x)
        idx.save(tmp_path)
        q = _unit(rng, 3, d)
        a_ids, a_s = idx.search(q, 5)

        # default reload: dtype comes from the manifest
        idx2 = FlatIndex.load(tmp_path, name="q8")
        assert idx2.dtype == jnp.int8
        b_ids, b_s = idx2.search(q, 5)
        np.testing.assert_array_equal(a_ids, b_ids)
        np.testing.assert_allclose(a_s, b_s, atol=1e-5)

        # dtype override: payload rescaled into unit space, scores cosine.
        # (int8 search quantizes the queries too, so near-ties may swap rank
        # vs float scoring — compare candidate sets and score scale.)
        idx3 = FlatIndex.load(tmp_path, name="q8", dtype=jnp.float32)
        c_ids, c_s = idx3.search(q, 5)
        for a_row, c_row in zip(a_ids, c_ids):
            assert len(set(a_row.tolist()) & set(c_row.tolist())) >= 4
        np.testing.assert_allclose(np.sort(a_s), np.sort(c_s), atol=1e-2)
        assert np.all(np.abs(c_s) <= 1.01)  # not 127x mis-scaled


class TestKMeans:
    def test_clusters_separate_data(self):
        rng = np.random.default_rng(123)  # own seed: clustering quality is data-dependent
        d = 64
        centers = _unit(rng, 4, d)
        pts = np.concatenate([
            c + 0.05 * rng.standard_normal((50, d)).astype(np.float32) for c in centers])
        cents = kmeans(pts, 4, iters=10, seed=0)
        assert cents.shape == (4, d)
        np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-5)
        # every true center should be close to some learned centroid
        sims = centers @ cents.T
        assert sims.max(axis=1).min() > 0.95


class TestIVFIndex:
    @pytest.mark.smoke
    def test_recall_vs_oracle(self):
        # clustered data (like real sentence embeddings); uniform random
        # vectors have no IVF-exploitable structure by construction
        rng = np.random.default_rng(123)  # own seed: recall is data-dependent
        d, n, k = 128, 4000, 10
        centers = _unit(rng, 16, d)
        x = centers[rng.integers(0, 16, n)] + 0.15 * rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        ids = np.arange(5, 5 + n, dtype=np.int64)
        idx = IVFIndex(dim=d, nlist=32, list_size=256, nprobe=8)
        idx.train(x[:2000], iters=8)
        idx.upsert(ids, x)
        assert idx.count() == n

        q = x[rng.integers(0, n, 8)] + 0.05 * rng.standard_normal((8, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        got_ids, _ = idx.search(q, k)
        order, _ = _oracle(q, x, k)
        ref_ids = ids[order]
        recall = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / k for a, b in zip(got_ids, ref_ids)])
        assert recall >= 0.8, recall
        # full probe = exact
        got_ids_full, _ = idx.search(q, k, nprobe=32)
        recall_full = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / k for a, b in zip(got_ids_full, ref_ids)])
        assert recall_full >= 0.99, recall_full

    def test_search_begin_matches_search(self):
        """Dispatch-only search (the sharded fan-out overlap path): two
        programs begun before either materializes, both exactly equal to
        the blocking search()."""
        rng = np.random.default_rng(77)
        d, n, k = 64, 1500, 8
        centers = _unit(rng, 8, d)
        x = centers[rng.integers(0, 8, n)] + 0.1 * rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        ids = np.arange(1, 1 + n, dtype=np.int64)
        idx = IVFIndex(dim=d, nlist=8, list_size=256, nprobe=8)
        idx.train(x[:400], iters=6)
        idx.upsert(ids, x)

        q1, q2 = x[:5], x[100:103]
        m1 = idx.search_begin(q1, k)
        m2 = idx.search_begin(q2, k)   # dispatched before m1 materializes
        ids2, s2 = m2()
        ids1, s1 = m1()
        ref1 = idx.search(q1, k)
        ref2 = idx.search(q2, k)
        np.testing.assert_array_equal(ids1, ref1[0])
        np.testing.assert_array_equal(ids2, ref2[0])
        np.testing.assert_allclose(s1, ref1[1], rtol=1e-6)
        np.testing.assert_allclose(s2, ref2[1], rtol=1e-6)

        # empty-index begin returns the empty materializer
        empty = IVFIndex(dim=d, nlist=8, list_size=128, nprobe=4)
        empty.train(x[:200], iters=2)
        eids, es = empty.search_begin(q1, k)()
        assert eids.shape == (5, k) and np.all(es == -np.inf)

    def test_overflow_fallback(self, rng):
        d = 64
        idx = IVFIndex(dim=d, nlist=2, list_size=128, nprobe=2)
        idx.train(_unit(rng, 100, d), iters=4)
        # insert more than one list can hold near a single centroid
        x = _unit(rng, 300, d)
        idx.upsert(np.arange(1, 301, dtype=np.int64), x)
        assert idx.count() == 300

    def test_retrain_preserves_contents(self):
        rng = np.random.default_rng(5)
        d, n, k = 64, 800, 5
        centers = _unit(rng, 8, d)
        x = centers[rng.integers(0, 8, n)] + 0.1 * rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        ids = np.arange(1, 1 + n, dtype=np.int64)
        idx = IVFIndex(dim=d, nlist=8, list_size=256, nprobe=8)
        # train on a skewed early sample, then retrain on everything
        idx.train(x[:50], iters=4)
        idx.upsert(ids, x)
        before, _ = idx.search(x[:4], k)
        idx.retrain(iters=8)
        assert idx.count() == n
        after, _ = idx.search(x[:4], k)
        # full-probe search is exact either way -> identical results
        np.testing.assert_array_equal(np.sort(before, axis=1), np.sort(after, axis=1))

    def test_save_load(self, rng, tmp_path):
        d, n = 64, 512
        x = _unit(rng, n, d)
        idx = IVFIndex(dim=d, nlist=8, list_size=128, nprobe=4, name="ivf_t")
        idx.train(x, iters=4)
        idx.upsert(np.arange(100, 100 + n, dtype=np.int64), x)
        idx.save(tmp_path)
        idx2 = IVFIndex.load(tmp_path, name="ivf_t")
        assert idx2.count() == n
        q = _unit(rng, 2, d)
        a, _ = idx.search(q, 5)
        b, _ = idx2.search(q, 5)
        np.testing.assert_array_equal(a, b)


    def test_int8_storage_recall(self):
        # int8 IVF: per-vector quantization scales ride in the validity
        # array (same scheme as FlatIndex); recall stays near the bf16 path
        import jax.numpy as jnp

        rng = np.random.default_rng(42)
        d, n, k = 128, 4000, 10
        centers = _unit(rng, 16, d)
        x = centers[rng.integers(0, 16, n)] + 0.15 * rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        ids = np.arange(5, 5 + n, dtype=np.int64)
        idx = IVFIndex(dim=d, nlist=32, list_size=256, nprobe=32, dtype=jnp.int8)
        idx.train(x[:2000], iters=8)
        idx.upsert(ids, x)

        q = x[rng.integers(0, n, 8)] + 0.05 * rng.standard_normal((8, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        got_ids, got_s = idx.search(q, k)          # full probe = exhaustive
        order, ref_s = _oracle(q, x, k)
        ref_ids = ids[order]
        recall = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / k for a, b in zip(got_ids, ref_ids)])
        assert recall >= 0.9, recall
        # scores come back dequantized into cosine range
        assert np.all(got_s <= 1.05) and np.abs(got_s[:, 0] - ref_s[:, 0]).max() < 0.05

    def test_int8_save_load_and_dtype_change(self, rng, tmp_path):
        import jax.numpy as jnp

        d, n = 64, 512
        x = _unit(rng, n, d)
        idx = IVFIndex(dim=d, nlist=8, list_size=128, nprobe=8, dtype=jnp.int8, name="ivf_i8")
        idx.train(x, iters=4)
        idx.upsert(np.arange(100, 100 + n, dtype=np.int64), x)
        idx.delete([100, 101])
        idx.save(tmp_path)

        q = _unit(rng, 3, d)
        a_ids, a_s = idx.search(q, 5)

        # same-dtype reload: identical results
        idx2 = IVFIndex.load(tmp_path, name="ivf_i8")
        assert idx2.dtype == jnp.int8 and idx2.count() == n - 2
        b_ids, b_s = idx2.search(q, 5)
        np.testing.assert_array_equal(a_ids, b_ids)
        np.testing.assert_allclose(a_s, b_s, atol=1e-5)

        # cross-dtype reload decodes int8 payload back to unit-vector space
        idx3 = IVFIndex.load(tmp_path, name="ivf_i8", dtype=jnp.bfloat16)
        assert idx3.dtype == jnp.bfloat16
        c_ids, c_s = idx3.search(q, 5)
        assert len(set(c_ids[0].tolist()) & set(a_ids[0].tolist())) >= 4
        assert np.all(c_s[np.isfinite(c_s)] <= 1.05)
        assert 100 not in set(c_ids.ravel().tolist())


class TestEmptyBatches:
    """Empty ingest batches (a document yielding parents but no children)
    must be no-ops — the donated-scatter pad path indexed [-1] on them."""

    def test_flat_empty_upsert(self):
        idx = FlatIndex(dim=16, capacity=128)
        idx.upsert([], np.zeros((0, 16), np.float32))
        assert idx.count() == 0

    def test_ivf_empty_upsert(self, rng):
        idx = IVFIndex(dim=16, nlist=2, list_size=128, nprobe=2)
        idx.train(_unit(rng, 64, 16), iters=2)
        idx.upsert([], np.zeros((0, 16), np.float32))
        assert idx.count() == 0


class TestStores:
    @pytest.mark.smoke
    def test_snowflake_unique_and_sortable(self):
        from financial_rag_tpu.store import SnowflakeGenerator

        gen = SnowflakeGenerator(worker_id=3)
        ids = [gen.next_id() for _ in range(5000)]
        assert len(set(ids)) == len(ids)
        assert ids == sorted(ids)
        import time
        assert abs(SnowflakeGenerator.timestamp_ms(ids[-1]) / 1000 - time.time()) < 5

    @pytest.mark.smoke
    def test_parent_store_roundtrip(self, tmp_path):
        from financial_rag_tpu.store import ParentStore

        ps = ParentStore(tmp_path / "p.db")
        ps.upsert_parents([
            {"parent_id": 2, "document_id": "doc1", "page_start": 1, "page_end": 2, "content": "two"},
            {"parent_id": 1, "document_id": "doc1", "page_start": 0, "page_end": 1, "content": "one"},
            {"parent_id": 3, "document_id": "doc2", "content": "three"},
        ])
        assert ps.count() == 3
        got = ps.get_parents_by_ids([3, 1, 99, 3])
        assert [p["parent_id"] for p in got] == [3, 1]  # order preserved, dedup, missing skipped
        assert ps.delete_document("doc1") == 2
        assert ps.count() == 1
        # upsert overwrites
        ps.upsert_parents([{"parent_id": 3, "document_id": "doc2", "content": "THREE"}])
        assert ps.get_parents_by_ids([3])[0]["content"] == "THREE"

    def test_child_meta_store(self, tmp_path):
        from financial_rag_tpu.store import ChildMetaStore

        cs = ChildMetaStore(tmp_path / "c.db")
        cs.upsert_children([
            {"child_id": 10, "parent_id": 1, "document_id": "d1", "snippet": "abc",
             "source_path": "/x/d1.pdf", "source_mtime": 123.0},
            {"child_id": 11, "parent_id": 1, "document_id": "d1", "snippet": "def", "context": "ctx"},
        ])
        got = cs.get_children([11, 10, 99])
        assert set(got) == {10, 11}
        assert got[11]["context"] == "ctx"
        assert cs.children_of_document("d1") == [10, 11]
        assert cs.delete_document("d1") == 2
        assert cs.count() == 0
