"""Retrieval layer: fusion math, BM25, filters, rerank, hybrid e2e."""

import json
import math

import numpy as np
import pytest

from financial_rag_tpu.config import FusionConfig, ModelConfig, RerankConfig, RetrievalConfig
from financial_rag_tpu.index import FlatIndex
from financial_rag_tpu.ingest.pipeline import IngestionPipeline, collection_slug
from financial_rag_tpu.models.encoder import DualEncoder
from financial_rag_tpu.models.hashing import HashingEncoder
from financial_rag_tpu.retrieval import (
    BM25,
    CrossEncoderReranker,
    HybridRetriever,
    ParentContextRetriever,
    minmax_avg_fuse,
    rrf_fuse,
)
from financial_rag_tpu.retrieval.filters import build_filter, passes_filter
from financial_rag_tpu.retrieval.rerank import adaptive_normalize
from financial_rag_tpu.store import ChildMetaStore, ParentStore


class TestFusion:
    @pytest.mark.smoke
    def test_rrf_math(self):
        # two lists; id 'a' rank1+rank2, 'b' rank2, 'c' rank1
        fused = rrf_fuse([["a", "b"], ["c", "a"]], k=60)
        assert math.isclose(fused["a"], 1 / 61 + 1 / 62)
        assert math.isclose(fused["b"], 1 / 62)
        assert math.isclose(fused["c"], 1 / 61)

    def test_rrf_orders_consistent_winner_first(self):
        fused = rrf_fuse([["x", "y", "z"], ["x", "z", "y"]], k=60)
        assert max(fused, key=fused.get) == "x"

    def test_minmax_avg(self):
        fused = minmax_avg_fuse([
            [("a", 2.0), ("b", 1.0), ("c", 0.0)],
            [("b", 10.0), ("a", 0.0)],
        ])
        assert math.isclose(fused["a"], (1.0 + 0.0) / 2)
        assert math.isclose(fused["b"], (0.5 + 1.0) / 2)
        assert math.isclose(fused["c"], 0.0)

    def test_constant_score_list_contributes_zero(self):
        fused = minmax_avg_fuse([[("a", 5.0), ("b", 5.0)]])
        assert fused["a"] == 0.0 and fused["b"] == 0.0


class TestBM25:
    CORPUS = [
        "the rent amount is forty thousand rupees".split(),
        "gst tax at eighteen percent applies".split(),
        "lock in period of thirty six months".split(),
        "the weather is mild in paris".split(),
    ]

    def test_relevant_doc_scores_highest(self):
        bm = BM25(self.CORPUS)
        scores = bm.get_scores("rent amount".split())
        assert scores.argmax() == 0
        assert scores[3] == 0.0

    @pytest.mark.smoke
    def test_okapi_formula_hand_check(self):
        # single-term query over a 2-doc corpus, hand-computed BM25Okapi
        corpus = [["apple", "banana"], ["banana", "banana", "cherry"]]
        bm = BM25(corpus)
        n, k1, b = 2, 1.5, 0.75
        avgdl = 2.5
        idf_apple = math.log((n - 1 + 0.5) / (1 + 0.5))
        tf = 1.0
        expected = idf_apple * tf * (k1 + 1) / (tf + k1 * (1 - b + b * 2 / avgdl))
        got = bm.get_scores(["apple"])
        assert math.isclose(got[0], expected, rel_tol=1e-6)
        assert got[1] == 0.0

    def test_negative_idf_floored(self):
        # a term in every doc has negative raw idf -> replaced by eps*avg_idf
        # (rank_bm25 BM25Okapi semantics; the floor itself may be negative)
        corpus = [["common", "x"], ["common", "y"], ["common", "z"]]
        bm = BM25(corpus)
        raw = math.log((3 - 3 + 0.5) / (3 + 0.5))
        rare = math.log((3 - 1 + 0.5) / (1 + 0.5))
        avg = (raw + 3 * rare) / 4
        assert bm.idf["common"] == pytest.approx(0.25 * avg)
        assert bm.idf["common"] > raw

    def test_empty_corpus(self):
        bm = BM25([])
        assert bm.get_scores(["x"]).shape == (0,)


class TestFilters:
    def test_no_filters_pass_everything(self):
        f = build_filter(None)
        assert not f.active
        assert passes_filter(f, None, None)

    @pytest.mark.smoke
    def test_filetype_mapping(self):
        f = build_filter({"fileType": ["PDF", "excel"]})
        assert passes_filter(f, "/docs/a.pdf", None)
        assert passes_filter(f, "/docs/b.XLSX", None)
        assert not passes_filter(f, "/docs/c.docx", None)
        assert not passes_filter(f, None, None)  # unknown path fails closed

    def test_unknown_filetype_filters_all(self):
        f = build_filter({"fileType": ["page"]})
        assert f.active
        assert not passes_filter(f, "/docs/a.pdf", None)

    def test_relative_time_window(self):
        now = 1_000_000_000.0
        f = build_filter({"timeRange": {"type": "week"}}, now=now)
        assert passes_filter(f, None, now - 3 * 86400)
        assert not passes_filter(f, None, now - 8 * 86400)
        assert not passes_filter(f, None, None)

    def test_custom_range_swapped_dates(self):
        f = build_filter({"timeRange": {"type": "custom",
                                        "startDate": "2024-06-01", "endDate": "2024-01-01"}})
        jan, jul = 1706745600.0, 1719878400.0  # 2024-02-01, 2024-07-02 epoch
        assert passes_filter(f, None, jan)
        assert not passes_filter(f, None, jul)

    def test_custom_range_end_day_inclusive(self):
        """A date-only endDate means the WHOLE end day: start=end=today
        must match documents modified during today (the UI's date inputs
        send date-only strings; midnight-exclusive parsing silently
        returned zero results)."""
        from datetime import datetime

        f = build_filter({"timeRange": {"type": "custom",
                                        "startDate": "2024-06-01",
                                        "endDate": "2024-06-01"}})
        noon = datetime.fromisoformat("2024-06-01T12:00:00").timestamp()
        end_of_day = datetime.fromisoformat("2024-06-01T23:59:58").timestamp()
        next_day = datetime.fromisoformat("2024-06-02T00:00:02").timestamp()
        assert passes_filter(f, None, noon)
        assert passes_filter(f, None, end_of_day)
        assert not passes_filter(f, None, next_day)
        # an explicit timestamped endDate stays exact (no day extension)
        f2 = build_filter({"timeRange": {"type": "custom",
                                         "startDate": "2024-06-01T00:00:00",
                                         "endDate": "2024-06-01T06:00:00"}})
        assert not passes_filter(f2, None, noon)

    def test_custom_range_reversed_dates_extend_the_upper_bound(self):
        """ADVICE r3: a REVERSED range (startDate later than endDate) must
        extend whichever date-only value becomes the UPPER bound after the
        swap — keying off the raw endDate string extended the wrong side
        (and a date-only startDate that became the upper bound was never
        extended, silently dropping the whole end day)."""
        from datetime import datetime

        # reversed: the date-only startDate is the real upper bound
        f = build_filter({"timeRange": {"type": "custom",
                                        "startDate": "2024-06-10",
                                        "endDate": "2024-06-01"}})
        end_of_last_day = datetime.fromisoformat("2024-06-10T23:59:58").timestamp()
        next_day = datetime.fromisoformat("2024-06-11T00:00:02").timestamp()
        assert passes_filter(f, None, end_of_last_day)
        assert not passes_filter(f, None, next_day)
        # reversed with a TIMESTAMPED startDate as upper bound: stays exact
        f2 = build_filter({"timeRange": {"type": "custom",
                                         "startDate": "2024-06-10T06:00:00",
                                         "endDate": "2024-06-01"}})
        noon = datetime.fromisoformat("2024-06-10T12:00:00").timestamp()
        assert not passes_filter(f2, None, noon)
        # ...and the date-only endDate that became the LOWER bound is not
        # extended past documents modified early that day
        start_morning = datetime.fromisoformat("2024-06-01T00:30:00").timestamp()
        assert passes_filter(f2, None, start_morning)

    def test_all_type_inactive(self):
        f = build_filter({"timeRange": {"type": "all"}})
        assert not f.active

    def test_every_ui_option_is_honored(self):
        # every option the built-in UI offers must have server semantics
        # (review finding: 6months/image/json/dataSource were silent no-ops)
        now = 1_000_000_000.0
        f = build_filter({"timeRange": {"type": "6months"}}, now=now)
        assert f.active and not passes_filter(f, None, now - 200 * 86400)
        f = build_filter({"fileType": ["image"]})
        assert passes_filter(f, "/d/scan.JPG", None)
        assert not passes_filter(f, "/d/a.pdf", None)
        f = build_filter({"fileType": ["json"]})
        assert passes_filter(f, "/d/cn22-23.json", None)

    def test_datasource_matches_card_attribution(self):
        # documents are attributed "Windows Shares" (serving/formatting.py);
        # the filter is honored against that attribution
        f = build_filter({"dataSource": ["Windows Shares", "SharePoint"]})
        assert passes_filter(f, "/d/a.pdf", None)
        f = build_filter({"dataSource": ["SharePoint"]})
        assert f.active
        assert not passes_filter(f, "/d/a.pdf", None)


class TestAdaptiveNormalize:
    def test_all_positive_max_norm(self):
        out, method = adaptive_normalize(np.array([1.0, 2.0, 4.0]))
        assert method == "max-normalization"
        np.testing.assert_allclose(out, [0.25, 0.5, 1.0])

    @pytest.mark.smoke
    def test_mixed_minmax(self):
        out, method = adaptive_normalize(np.array([-1.0, 0.0, 1.0]))
        assert method == "min-max-normalization"
        np.testing.assert_allclose(out, [0.0, 0.5, 1.0])

    def test_flat_rank_based(self):
        out, method = adaptive_normalize(np.array([0.5, 0.5001, 0.5]))
        assert method == "rank-based"
        assert out.max() == 1.0 and out.min() >= 0.1 - 1e-6


class _FakeCrossModel:
    """Deterministic lexical-overlap scorer standing in for the MiniLM head."""

    def predict(self, pairs):
        out = []
        for q, t in pairs:
            qs, ts = set(q.lower().split()), set(t.lower().split())
            out.append(len(qs & ts) / max(len(qs), 1))
        return np.asarray(out, np.float32)


class TestReranker:
    CHUNKS = [
        {"text": "completely unrelated text about gardening", "retrieval_score": 0.9},
        {"text": "the annual rent amount is 42800 rupees", "retrieval_score": 0.1},
        {"text": "rent is mentioned here once", "retrieval_score": 0.2},
    ]

    @pytest.mark.smoke
    def test_rerank_reorders_by_relevance(self):
        rr = CrossEncoderReranker.__new__(CrossEncoderReranker)
        rr.model = _FakeCrossModel()
        rr.cfg = RerankConfig()
        rr.healthy = True
        out = rr.rerank_chunks("what is the annual rent amount", [dict(c) for c in self.CHUNKS])
        assert "42800" in out[0]["text"]
        assert all("final_rerank_score" in c for c in out)

    def test_aggregation_strategy_skips(self):
        rr = CrossEncoderReranker.__new__(CrossEncoderReranker)
        rr.model = _FakeCrossModel()
        rr.cfg = RerankConfig()
        out = rr.rerank_chunks("total of everything", [dict(c) for c in self.CHUNKS],
                               strategy="Aggregation", top_k=2)
        assert len(out) == 2
        assert out[0]["text"] == self.CHUNKS[0]["text"]  # original order kept

    def test_no_model_falls_back_to_retrieval_sort(self):
        rr = CrossEncoderReranker(None)
        out = rr.rerank_chunks("q", [dict(c) for c in self.CHUNKS])
        assert out[0]["retrieval_score"] == 0.9
        assert out[0]["normalization_method"] == "no-model-retrieval-sort"

    def test_jax_cross_encoder_predict_shapes(self):
        from financial_rag_tpu.models.checkpoint import random_params
        from financial_rag_tpu.retrieval.rerank import CrossEncoderModel

        cfg = ModelConfig(name="tiny-ce", hidden_size=128, num_layers=2, num_heads=4,
                          intermediate_size=256, vocab_size=30522, max_position=512,
                          num_labels=1)
        model = CrossEncoderModel(cfg, random_params(cfg, seed=0))
        scores = model.predict([("what is rent", "rent is 42800"), ("a", "b"), ("c", "d")])
        assert scores.shape == (3,)
        assert np.isfinite(scores).all()


@pytest.fixture
def rag_stack(tmp_path):
    """Small fully-ingested stack with lexical encoders."""
    enc = DualEncoder({
        "baai": HashingEncoder(dim=128, salt=1),
        "gte": HashingEncoder(dim=128, salt=2),
    })
    indexes = {n: FlatIndex(dim=128, capacity=1024, name=collection_slug(n)) for n in enc.names}
    parent_store = ParentStore(tmp_path / "p.db")
    child_meta = ChildMetaStore(tmp_path / "c.db")
    pipe = IngestionPipeline(enc, parent_store, child_meta, indexes)

    docs = {
        "lease": ("The lease agreement states the rent for the first year is Rs 40,000 "
                  "per month and the rent for the second year is Rs 42,800 per month. "
                  "The lock-in period is 36 months from the commencement date. "
                  "The lessor is M/s Bhartiya Enterprises. ") * 3,
        "invoice": ("Tax Invoice number INV-42 dated 30-Jul-22. The total invoice amount "
                    "is Rs 1,18,000 including GST. The GST amount charged is Rs 18,000 "
                    "at the rate of 18 percent. Supplier: Acme Traders. ") * 3,
        "memo": ("This memo covers office supplies procurement policy and travel "
                 "reimbursement guidance for employees. ") * 5,
    }
    for doc_id, text in docs.items():
        p = tmp_path / f"{doc_id}.json"
        p.write_text(json.dumps({"blocks": [{"content": text, "page": 0}]}))
        pipe.ingest_extracted_json(p, doc_id, source_path=f"/src/{doc_id}.pdf",
                                   source_mtime=1_700_000_000.0)
    return pipe, enc, indexes, parent_store, child_meta


class TestParentContextRetriever:
    def test_golden_question_hits_right_parent(self, rag_stack):
        pipe, enc, indexes, parent_store, child_meta = rag_stack
        r = ParentContextRetriever(enc, indexes, parent_store, child_meta)
        out = r.query("What is the rent for the second year?", top_k=8, dedup_parents=4)
        assert out["child_hits"]
        assert out["parent_contexts"]
        assert any("42,800" in p["content"] for p in out["parent_contexts"])
        # dedup: parent ids unique and ordered
        pids = [p["parent_id"] for p in out["parent_contexts"]]
        assert len(pids) == len(set(pids))


class TestHybridRetriever:
    def test_hybrid_retrieval_ranks_relevant_first(self, rag_stack):
        pipe, enc, indexes, parent_store, child_meta = rag_stack
        h = HybridRetriever(enc, indexes, child_meta)
        chunks, child_parent, queries = h.retrieve_children("What is the GST amount on the invoice?")
        assert queries == ["What is the GST amount on the invoice?"]  # NullLLM
        assert chunks
        assert "GST" in chunks[0]["text"]
        assert chunks[0]["child_id"] in child_parent
        scores = [c["retrieval_score"] for c in chunks]
        assert scores == sorted(scores, reverse=True)

    def test_avg_fusion_mode(self, rag_stack):
        pipe, enc, indexes, parent_store, child_meta = rag_stack
        fc = FusionConfig()
        fc.method = "avg"
        h = HybridRetriever(enc, indexes, child_meta, fusion_cfg=fc)
        chunks, _, _ = h.retrieve_children("lock-in period months")
        assert chunks and "lock-in" in chunks[0]["text"].lower()

    def test_hitk_diagnostic_logs(self, rag_stack):
        import io
        import logging

        pipe, enc, indexes, parent_store, child_meta = rag_stack
        rc = RetrievalConfig()
        rc.hitk_expect_contains = "42,800"
        rc.hitk_k = 10
        h = HybridRetriever(enc, indexes, child_meta, retrieval_cfg=rc)
        buf = io.StringIO()
        handler = logging.StreamHandler(buf)
        logger = logging.getLogger("financial_rag_tpu.retrieval.hybrid")
        logger.addHandler(handler)
        try:
            h.retrieve_children("second year rent")
        finally:
            logger.removeHandler(handler)
        assert "hit@10=YES" in buf.getvalue()
