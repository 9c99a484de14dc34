"""nprobe auto-tuning: pick the smallest nprobe that meets a recall
target, measured against the index's own exhaustive (nprobe=nlist) sweep.
New TPU-framework surface — the reference's IVF path (pgvector IVFFlat,
reference pgvector_child_store.py:92-98) has no tuning at all."""

import numpy as np
import pytest

from financial_rag_tpu.index.ivf import IVFIndex
from financial_rag_tpu.parallel.sharded_ivf import ShardedIVFIndex


def _clustered(rng, n, d, n_centers=16, spread=0.15):
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, n_centers, n)] + spread * rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def ivf():
    rng = np.random.default_rng(123)  # own seed: recall is data-dependent
    d, n = 64, 4000
    x = _clustered(rng, n, d)
    idx = IVFIndex(dim=d, nlist=32, list_size=256, nprobe=32)
    idx.train(x[:2000], iters=8)
    idx.upsert(np.arange(1, 1 + n, dtype=np.int64), x)
    return idx


class TestTuneNprobe:
    def test_tunes_below_nlist_and_meets_target(self, ivf):
        report = ivf.tune_nprobe(k=10, target_recall=0.9, sample=64, seed=0)
        assert report["applied"]
        assert ivf.nprobe == report["nprobe"]
        # clustered data must not need an exhaustive probe
        assert report["nprobe"] < ivf.nlist
        assert report["sweep"][-1]["recall"] >= 0.9

    def test_monotone_sweep_and_termination_at_target_1(self, ivf):
        report = ivf.tune_nprobe(k=10, target_recall=1.0, sample=64, seed=1)
        recalls = [s["recall"] for s in report["sweep"]]
        # doubling nprobe can only add probed lists -> recall non-decreasing
        assert all(b >= a - 1e-9 for a, b in zip(recalls, recalls[1:]))
        assert report["nprobe"] <= ivf.nlist
        # chosen nprobe really delivers: re-measure with explicit queries
        q = ivf.sample_vectors(32, seed=7)
        exact, _ = ivf.search(q, 10, nprobe=ivf.nlist)
        got, _ = ivf.search(q, 10)
        rec = np.mean([len(set(a.tolist()) & set(b.tolist())) / 10
                       for a, b in zip(got, exact)])
        assert rec >= 0.99, rec

    def test_explicit_queries_path(self, ivf):
        rng = np.random.default_rng(5)
        q = _clustered(rng, 16, ivf.dim)
        report = ivf.tune_nprobe(k=5, queries=q, target_recall=0.8, apply=False)
        assert report["queries"] == 16
        assert not report["applied"]

    @pytest.mark.smoke
    def test_empty_index_noop(self):
        idx = IVFIndex(dim=32, nlist=8, list_size=128, nprobe=4)
        report = idx.tune_nprobe()
        assert report["sweep"] == [] and report["queries"] == 0

    def test_unreachable_target_caps_below_exhaustive(self, ivf):
        """ADVICE r2: when no nprobe < nlist meets the target, the applied
        fallback must NOT be the exhaustive nprobe=nlist (a permanent
        latency cliff auto-applied after ingest sweeps) — it caps at
        nlist//2 with a loud warning, and the report says the target was
        missed. target_recall > 1 makes the miss deterministic."""
        import logging

        from financial_rag_tpu.index import tuning as tuning_mod

        records = []

        class _Catch(logging.Handler):
            def emit(self, record):
                records.append(record)

        handler = _Catch(level=logging.WARNING)
        tuning_mod.log.addHandler(handler)
        before = ivf.nprobe
        try:
            report = ivf.tune_nprobe(k=10, target_recall=1.01, sample=32)
            # fallback = the largest point the sweep MEASURED (here 16,
            # the last power of two below nlist=32)
            assert report["nprobe"] == report["sweep"][-1]["nprobe"] == 16
            assert report["nprobe"] < ivf.nlist
            assert report["target_met"] is False
            # the worst-sample recall at the applied point is recorded
            assert report["recall_min"] is not None
            assert ivf.nprobe == report["nprobe"]  # applied, but capped
            assert any("autotune" in r.getMessage() for r in records)
        finally:
            ivf.nprobe = before  # module-scoped fixture: restore
            tuning_mod.log.removeHandler(handler)

    def test_unreachable_fallback_is_a_measured_point_odd_nlist(self):
        """With nlist NOT a power of two (e.g. 48), nlist//2 = 24 was never
        in the 1,2,4,... sweep — the fallback must apply the largest point
        actually measured (32), never an unmeasured operating point."""
        rng = np.random.default_rng(7)
        d, n = 32, 3000
        x = _clustered(rng, n, d, n_centers=48)
        idx = IVFIndex(dim=d, nlist=48, list_size=128, nprobe=48)
        idx.train(x[:1500], iters=6)
        idx.upsert(np.arange(1, 1 + n, dtype=np.int64), x)
        report = idx.tune_nprobe(k=10, target_recall=1.01, sample=32,
                                 apply=False)
        swept = {s["nprobe"] for s in report["sweep"]}
        assert report["nprobe"] in swept
        assert report["nprobe"] == max(swept) == 32
        assert report["recall_min"] is not None

    def test_margin_and_resamples_guard_the_cliff(self, ivf):
        """VERDICT r3 #5: the pick must clear target + margin on the WORST
        of multiple independent samples, so one lucky sample sitting
        exactly on the target can't select a cliff-edge operating point."""
        report = ivf.tune_nprobe(k=10, target_recall=0.9, sample=64,
                                 margin=0.03, resamples=3, apply=False)
        assert report["effective_target"] == pytest.approx(0.93)
        assert report["resamples"] == 3
        if report["target_met"]:
            assert report["recall_min"] >= 0.93
        # every sweep row reports its worst-sample recall
        assert all("recall_min" in s and s["recall_min"] <= s["recall"] + 1e-9
                   for s in report["sweep"])

    def test_ood_guard_never_lowers_and_meets_shifted_target(self, ivf):
        """The safety-margin rule (VERDICT r4 #7): with ood_guard=True the
        chosen nprobe must also clear the target on a worst-case SHIFTED
        sample (uniform random unit queries) — the guard can raise the
        pick, never lower it, and the report records what it did."""
        plain = ivf.tune_nprobe(k=10, target_recall=0.9, sample=64, seed=0,
                                apply=False)
        guarded = ivf.tune_nprobe(k=10, target_recall=0.9, sample=64, seed=0,
                                  apply=False, ood_guard=True)
        assert guarded["nprobe"] >= plain["nprobe"]
        g = guarded["ood_guard"]
        assert g is not None
        assert g["start_nprobe"] == plain["nprobe"]
        assert g["guarded_nprobe"] == guarded["nprobe"]
        # the guard stops only when shifted recall clears the raw target
        # (or nprobe hit nlist, which is exhaustive)
        assert g["shifted_recall"] >= 0.9 or guarded["nprobe"] == ivf.nlist
        # and the guarded pick really delivers on a fresh shifted sample
        rng = np.random.default_rng(99)
        q = rng.standard_normal((64, ivf.dim)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        exact, _ = ivf.search(q, 10, nprobe=ivf.nlist)
        got, _ = ivf.search(q, 10, nprobe=guarded["nprobe"])
        rec = np.mean([len(set(a.tolist()) & set(b.tolist())) / 10
                       for a, b in zip(got, exact)])
        assert rec >= 0.85, rec   # fresh-sample slack below the 0.9 target

    def test_choice_is_stable_across_resampled_seeds(self, ivf):
        """The same index tuned with disjoint random query samples must
        pick the same operating point (the instability the margin +
        worst-sample rule exists to remove)."""
        picks = {ivf.tune_nprobe(k=10, target_recall=0.9, sample=64,
                                 seed=s, apply=False)["nprobe"]
                 for s in (0, 1, 2, 3)}
        assert len(picks) == 1, f"unstable nprobe picks across seeds: {picks}"

    def test_recorded_queries_split_into_subsets(self, ivf):
        rng = np.random.default_rng(5)
        q = _clustered(rng, 64, ivf.dim)
        report = ivf.tune_nprobe(k=5, queries=q, target_recall=0.8, apply=False)
        assert report["queries"] == 64
        assert report["resamples"] == 2   # 64 rows -> two 32-row samples

    def test_sharded_ivf_tuning_applies_to_all_shards(self):
        rng = np.random.default_rng(123)
        d, n = 64, 3000
        x = _clustered(rng, n, d)
        idx = ShardedIVFIndex(dim=d, n_shards=2, nlist=16, list_size=256, nprobe=16)
        idx.train(x[:1500], iters=8)
        idx.upsert(np.arange(1, 1 + n, dtype=np.int64), x)
        report = idx.tune_nprobe(k=10, target_recall=0.9, sample=64)
        assert report["nprobe"] < idx.nlist
        assert all(s.nprobe == report["nprobe"] for s in idx.shards)
        # tuned value persists through save/load via the shard manifests
        assert idx.nprobe == report["nprobe"]


class TestRuntimeAutotune:
    def test_runtime_tunes_after_sweep(self, tmp_path, monkeypatch):
        monkeypatch.setenv("INDEX_KIND", "ivf")
        monkeypatch.setenv("IVF_NLIST", "8")
        monkeypatch.setenv("IVF_NPROBE", "8")
        monkeypatch.setenv("IVF_AUTOTUNE_RECALL", "0.9")
        monkeypatch.setenv("IVF_AUTOTUNE_SAMPLE", "32")
        from financial_rag_tpu.config import FrameworkConfig
        from financial_rag_tpu.runtime import Runtime

        rt = Runtime.build(FrameworkConfig.from_env(), data_dir=tmp_path)
        rng = np.random.default_rng(9)
        x = _clustered(rng, 600, 384, n_centers=8)
        for idx in rt.indexes.values():
            idx.train(x, iters=4)
            idx.upsert(np.arange(1, 601, dtype=np.int64), x)
        reports = rt.tune_indexes()
        assert set(reports) == set(rt.indexes)
        for name, idx in rt.indexes.items():
            assert idx.nprobe == reports[name]["nprobe"]

    def test_runtime_feeds_recorded_queries_when_available(self, tmp_path, monkeypatch):
        """VERDICT r3 #6: once the serving embedding cache has seen enough
        real query vectors, tune_indexes must tune on THEM instead of
        perturbed index contents."""
        monkeypatch.setenv("INDEX_KIND", "ivf")
        monkeypatch.setenv("IVF_NLIST", "8")
        monkeypatch.setenv("IVF_NPROBE", "8")
        monkeypatch.setenv("IVF_AUTOTUNE_RECALL", "0.9")
        from financial_rag_tpu.config import FrameworkConfig
        from financial_rag_tpu.runtime import Runtime

        rt = Runtime.build(FrameworkConfig.from_env(), data_dir=tmp_path)
        rng = np.random.default_rng(11)
        x = _clustered(rng, 600, 384, n_centers=8)
        for idx in rt.indexes.values():
            idx.train(x, iters=4)
            idx.upsert(np.arange(1, 601, dtype=np.int64), x)

        # below the 32-vector floor: still perturbed-sample
        for i in range(8):
            for name in rt.indexes:
                rt.dual_encoder.cache.put(name, f"warm {i}", x[i])
        reports = rt.tune_indexes()
        assert all(r["query_source"] == "perturbed-sample" for r in reports.values())

        q = _clustered(rng, 48, 384, n_centers=8)
        for i in range(48):
            for name in rt.indexes:
                rt.dual_encoder.cache.put(name, f"real query {i}", q[i])
        reports = rt.tune_indexes()
        for name, r in reports.items():
            assert r["query_source"] == "recorded"
            assert r["queries"] == 48 + 8
            assert r["resamples"] >= 2   # recorded set split for stability

    def test_runtime_autotune_disabled_by_default(self, tmp_path):
        from financial_rag_tpu.config import FrameworkConfig
        from financial_rag_tpu.runtime import Runtime

        rt = Runtime.build(FrameworkConfig(), data_dir=tmp_path)
        assert rt.tune_indexes() == {}


class TestTinyCorpusIVF:
    @pytest.mark.smoke
    def test_auto_train_with_fewer_vectors_than_nlist(self):
        # streaming regime: first upsert batch smaller than nlist must not
        # crash the k-means empty-cluster reseed (k > n)
        rng = np.random.default_rng(3)
        x = _clustered(rng, 3, 384, n_centers=2)
        idx = IVFIndex(dim=384, nlist=8, list_size=128, nprobe=8)
        idx.upsert([11, 12, 13], x)  # auto-trains on 3 vectors
        assert idx.count() == 3
        ids, scores = idx.search(x[:1], 3)
        assert 11 in ids[0] or 12 in ids[0] or 13 in ids[0]
        assert np.isfinite(scores[0][0])
