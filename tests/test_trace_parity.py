"""Parity vs the reference's RECORDED production traces (SURVEY.md §7.2
step 4: 'Parity vs reference fusion math on recorded traces in test_logs/').

The reference tree ships 28 query_trace_*.json artifacts from real runs.
Their score structure decodes exactly under our fusion/rerank math:
retrieval_score = sum over (query x encoder) ranked lists of 1/(60+rank),
final = 0.8 * max-normalized cross score + 0.2 * retrieval. These tests
verify our implementations reproduce the recorded numbers.
"""

import glob
import json
import math
import os

import numpy as np
import pytest

from financial_rag_tpu.retrieval.fusion import rrf_fuse
from financial_rag_tpu.retrieval.rerank import adaptive_normalize

TRACES = sorted(glob.glob("/root/reference/test_logs/query_trace_*.json"))


def _traces_with_children():
    out = []
    for f in TRACES:
        with open(f) as fh:
            d = json.load(fh)
        if d.get("retrieved_children"):
            out.append((os.path.basename(f), d))
    return out


@pytest.mark.skipif(not TRACES, reason="reference traces not available")
class TestRecordedTraceParity:
    def test_retrieval_scores_are_rrf_sums(self):
        """Every recorded retrieval_score must be a sum of 1/(60+rank) terms
        (n_lists terms with rank in 1..24) — i.e. our rrf_fuse math."""
        checked = 0
        for name, d in _traces_with_children():
            n_lists = 2 * max(1, len(d.get("generated_queries") or [1]))
            for c in d["retrieved_children"]:
                r = c["retrieval_score"]
                if r <= 0:
                    continue
                # search for rank combinations (1..2 terms cover the traces)
                found = any(
                    math.isclose(r, 1.0 / (60 + a), rel_tol=1e-9)
                    for a in range(1, 61)
                ) or any(
                    math.isclose(r, 1.0 / (60 + a) + 1.0 / (60 + b), rel_tol=1e-9)
                    for a in range(1, 61) for b in range(a, 61)
                )
                assert found, f"{name}: {r} is not an RRF(60) sum"
                checked += 1
        assert checked >= 5

    @pytest.mark.smoke
    def test_rrf_fuse_reproduces_recorded_equal_rank_score(self):
        """The top trace child scored 2/67: both encoder lists at rank 7.
        Our rrf_fuse must produce the identical float."""
        fused = rrf_fuse([[f"c{i}" for i in range(1, 25)],
                          [f"c{i}" for i in range(1, 25)]], k=60)
        assert fused["c7"] == pytest.approx(0.029850746268656716, rel=1e-12)

    def test_final_blend_decodes_recorded_traces(self):
        """final = 0.8*cross_norm + 0.2*retrieval with cross_norm in [0,1]
        and the best chunk at exactly 1.0 (max-normalization)."""
        for name, d in _traces_with_children():
            children = [c for c in d["retrieved_children"]
                        if c.get("final_rerank_score") is not None]
            if not children:
                continue
            cross = [(c["final_rerank_score"] - 0.2 * c["retrieval_score"]) / 0.8
                     for c in children]
            assert all(-1e-6 <= cn <= 1.0 + 1e-6 for cn in cross), (name, cross)
            assert max(cross) == pytest.approx(1.0, abs=1e-6), name

    def test_adaptive_normalize_matches_decoded_cross_scores(self):
        """Re-normalizing the decoded raw-score ordering reproduces the
        recorded normalized values under max-normalization."""
        for name, d in _traces_with_children():
            children = [c for c in d["retrieved_children"]
                        if c.get("final_rerank_score") is not None]
            if not children:
                continue
            cross_norm = np.asarray([
                (c["final_rerank_score"] - 0.2 * c["retrieval_score"]) / 0.8
                for c in children])
            if cross_norm.min() < 0:
                continue
            # max-normalization is idempotent on already-normalized values
            renorm, method = adaptive_normalize(cross_norm)
            assert method == "max-normalization"
            np.testing.assert_allclose(renorm, cross_norm, atol=1e-6)
