"""Broad golden-question end-to-end suite over a multi-document corpus
(the reference's test strategy scaled up: SURVEY.md §4 golden questions,
LLM-free, lexical encoders)."""

import json

import pytest

from financial_rag_tpu.engine import RAGEngine
from financial_rag_tpu.index import FlatIndex
from financial_rag_tpu.ingest.pipeline import IngestionPipeline, collection_slug
from financial_rag_tpu.models.encoder import DualEncoder
from financial_rag_tpu.models.hashing import HashingEncoder
from financial_rag_tpu.retrieval.hybrid import HybridRetriever
from financial_rag_tpu.retrieval.rerank import CrossEncoderReranker
from financial_rag_tpu.store import ChildMetaStore, ParentStore

CORPUS = {
    "lease_2022": (
        "LEASE DEED executed between M/s Bhartiya Enterprises (the Lessor) and "
        "Acme Trading Pvt Ltd (the Lessee). The monthly rent for the first year "
        "shall be Rs 40,000. The monthly rent for the second year shall be "
        "Rs 42,800. The lock-in period under this lease is 36 months from the "
        "commencement date of 1 April 2022. A security deposit of Rs 2,40,000 "
        "is payable on signing. " * 2
    ),
    "invoice_cn24": (
        "TAX INVOICE / CREDIT NOTE No. CN/24 dated 30-Jul-22 issued by Bhartiya "
        "Enterprises, Chakulia. Taxable value Rs 2,15,625. CGST at 9 percent: "
        "Rs 19,406.25. SGST at 9 percent: Rs 19,406.25. Total invoice amount "
        "Rs 2,54,434 rounded. GSTIN 20AAIPL4886F1ZQ. " * 2
    ),
    "salary_memo": (
        "INTERNAL MEMO: the annual appraisal cycle concludes in March. Salary "
        "revisions take effect from 1 April. The travel reimbursement cap is "
        "Rs 3,500 per trip for domestic travel and requires manager approval. " * 3
    ),
    "insurance_policy": (
        "FIRE INSURANCE POLICY No. FI-9981 covering the warehouse at Chakulia. "
        "The sum insured is Rs 75,00,000. The annual premium is Rs 82,500 "
        "payable before 15 June each year. The policy excludes flood damage. " * 2
    ),
    "utility_bills": (
        "ELECTRICITY STATEMENT for March: units consumed 12,480, amount payable "
        "Rs 1,12,320 by the due date of 21 April. Late payment surcharge is 1.5 "
        "percent per month. Meter number JH-40213. " * 3
    ),
}

GOLDEN = [
    ("What is the rent for the second year?", "42,800"),
    ("What is the lock-in period of the lease?", "36 months"),
    ("Who is the lessor?", "Bhartiya Enterprises"),
    ("What is the total invoice amount on the credit note?", "2,54,434"),
    ("What is the CGST amount?", "19,406"),
    ("What is the sum insured under the fire policy?", "75,00,000"),
    ("What is the annual premium for the insurance?", "82,500"),
    ("What is the travel reimbursement cap per trip?", "3,500"),
    ("How many electricity units were consumed in March?", "12,480"),
]


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("golden")
    enc = DualEncoder({
        "baai": HashingEncoder(dim=192, salt=1),
        "gte": HashingEncoder(dim=192, salt=2),
    })
    indexes = {n: FlatIndex(dim=192, capacity=2048, name=collection_slug(n))
               for n in enc.names}
    ps = ParentStore(tmp_path / "p.db")
    cm = ChildMetaStore(tmp_path / "c.db")
    pipe = IngestionPipeline(enc, ps, cm, indexes)
    for doc_id, text in CORPUS.items():
        f = tmp_path / f"{doc_id}.json"
        f.write_text(json.dumps({"blocks": [{"content": text, "page": 0}]}))
        pipe.ingest_extracted_json(f, doc_id, source_path=str(f),
                                   source_mtime=f.stat().st_mtime)
    return RAGEngine(HybridRetriever(enc, indexes, cm), ps, CrossEncoderReranker(None))


@pytest.mark.parametrize("question,expected", GOLDEN)
def test_golden_question_answerable(engine, question, expected):
    """The expected fact must appear in the assembled answer context
    (NullLLM fallback returns the top parent contexts verbatim)."""
    out = engine.query(question)
    assert out["success"]
    context = out["answer"] + " " + " ".join(
        c["text"] for c in out["top_children_chunks"][:5])
    assert expected in context, f"{question!r}: {expected!r} not retrieved"


@pytest.mark.smoke
def test_hit_at_3_rate(engine):
    """Aggregate retrieval quality: the right chunk must rank top-3 for at
    least 8 of 9 golden questions."""
    hits = 0
    for question, expected in GOLDEN:
        out = engine.query(question)
        top3 = " ".join(c["text"] for c in out["top_children_chunks"][:3])
        hits += expected in top3
    assert hits >= 8, f"hit@3 only {hits}/9"
