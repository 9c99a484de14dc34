"""Chunker, Marker-JSON parsing, and end-to-end ingestion tests,
including the reference's bundled cn22-23 fixture (SURVEY.md §7.2 step 3:
the minimum end-to-end slice)."""

import json

import pytest

from financial_rag_tpu.config import ChunkingConfig
from financial_rag_tpu.index import FlatIndex
from financial_rag_tpu.ingest import ParentChildChunker
from financial_rag_tpu.ingest.chunker import normalize_text, token_estimate
from financial_rag_tpu.ingest.marker_json import parse_marker_blocks
from financial_rag_tpu.ingest.pipeline import IngestionPipeline, collection_slug
from financial_rag_tpu.models.encoder import DualEncoder
from financial_rag_tpu.models.hashing import HashingEncoder
from financial_rag_tpu.store import ChildMetaStore, ParentStore


class TestNormalize:
    @pytest.mark.smoke
    def test_html_stripping(self):
        t = normalize_text("<table><tr><th>Rent</th><td>42,800</td></tr></table>")
        assert "<" not in t and "Rent" in t and "42,800" in t

    def test_entities_and_whitespace(self):
        t = normalize_text("<p>a &amp; b</p>\n\n\n<p>c</p>")
        assert "a & b" in t and "\n\n" not in t

    def test_plain_text_passthrough(self):
        assert normalize_text("  hello   world  ") == "hello world"

    def test_token_estimate(self):
        assert token_estimate("one two three four") == int(4 * 1.3)


class TestMarkerShapes:
    def test_flat_blocks(self):
        blocks = parse_marker_blocks({"blocks": [
            {"content": "hello", "page": 2}, {"html": "<p>world</p>"}, {"content": "  "}]})
        assert [b["page"] for b in blocks] == [2, 0]

    def test_nested_children_with_page_ids(self):
        data = {"children": [
            {"id": "/page/0/Page/1", "block_type": "Page",
             "html": "<content-ref src='/page/0/Text/0'></content-ref>",
             "children": [
                 {"id": "/page/0/Text/0", "html": "<p>first page text</p>"}]},
            {"id": "/page/1/Page/2", "block_type": "Page",
             "children": [{"id": "/page/1/Text/0", "html": "<p>second page text</p>"}]},
        ], "block_type": "Document"}
        blocks = parse_marker_blocks(data)
        assert len(blocks) == 2
        assert blocks[0]["page"] == 0 and blocks[1]["page"] == 1
        assert "content-ref" not in blocks[0]["content"]

    def test_docs_pages_blocks(self):
        data = [{"pages": [
            {"page_number": 3, "blocks": [{"content": "x"}]},
            {"page_number": 4, "blocks": [{"html": "y"}]},
        ]}]
        blocks = parse_marker_blocks(data)
        assert [(b["content"], b["page"]) for b in blocks] == [("x", 3), ("y", 4)]

    def test_bare_block_list(self):
        blocks = parse_marker_blocks([{"content": "z", "page": 7}])
        assert blocks == [{"content": "z", "page": 7}]

    @pytest.mark.smoke
    def test_reference_fixture_parses(self, reference_fixture_json):
        blocks = parse_marker_blocks(reference_fixture_json)
        assert len(blocks) >= 1
        joined = " ".join(b["content"] for b in blocks)
        assert "Credit Note" in joined or "Tax Invoice" in joined


class TestChunker:
    def _prose(self, n_sentences: int) -> str:
        return " ".join(
            f"Sentence number {i} talks about invoice amounts and rental terms." for i in range(n_sentences))

    def test_parent_packing_respects_budget(self):
        cfg = ChunkingConfig()
        cfg.parent_max_tokens = 50
        ch = ParentChildChunker(cfg)
        blocks = [{"content": self._prose(3), "page": p} for p in range(6)]
        parents = ch.make_parents(blocks, "doc")
        assert len(parents) > 1
        for p in parents:
            assert p.token_count <= 50 + 30  # one block may overflow the soft cap
        # page ranges are contiguous and ordered
        assert parents[0].page_start == 0
        assert parents[-1].page_end == 5

    @pytest.mark.smoke
    def test_children_sentence_overlap(self):
        cfg = ChunkingConfig()
        cfg.child_max_tokens = 30
        cfg.child_overlap_words = 5
        ch = ParentChildChunker(cfg)
        texts = ch.split_child_texts(self._prose(12))
        assert len(texts) > 1
        # overlap: consecutive chunks share words
        w0, w1 = texts[0].split(), texts[1].split()
        assert w0[-5:] == w1[:5]

    def test_table_fallback_line_windows(self):
        cfg = ChunkingConfig()
        cfg.child_max_tokens = 20
        ch = ParentChildChunker(cfg)
        table = "\n".join(f"row{i} value{i} 100.{i}" for i in range(40))
        texts = ch.split_child_texts(table)
        assert len(texts) > 1  # line/window pass kicked in (no sentence breaks)

    def test_hard_window_fallback(self):
        cfg = ChunkingConfig()
        cfg.child_max_tokens = 10
        cfg.child_overlap_words = 2
        ch = ParentChildChunker(cfg)
        blob = " ".join(f"w{i}" for i in range(100))  # single line, no sentences
        texts = ch.split_child_texts(blob)
        assert len(texts) > 1

    def test_incremental_counts_match_naive_sentence_pass(self):
        """The O(text) incremental word counting must be bit-identical to
        the naive re-scan it replaced (same split decisions, same
        token_counts). Mixed punctuation exercises the \\w+ vs whitespace
        split divergence in overlap tails."""
        import re

        cfg = ChunkingConfig()
        cfg.child_max_tokens = 25
        cfg.child_overlap_words = 4
        ch = ParentChildChunker(cfg)
        sent_re = re.compile(r"[.!?]\s+")

        def naive_sentence_pass(text):
            out, cur = [], ""
            for sent in sent_re.split(text):
                if not sent:
                    continue
                merged = sent if not cur else f"{cur} {sent}"
                if token_estimate(merged) > cfg.child_max_tokens and cur:
                    out.append(cur.strip())
                    tail = cur.split()[-cfg.child_overlap_words:]
                    cur = (" ".join(tail) + " " + sent).strip()
                else:
                    cur = merged
            if cur:
                out.append(cur.strip())
            return [c for c in out if c]

        texts = [
            "Rent is 42,800 (year one). Lock-in: 36 months! GST @18%? "
            "The lessor — M/s. Alpha & Co. — shall pay; the lessee won't. " * 8,
            "a.b.c d-e-f g_h_i. " * 40,
            "One two three. " * 60,
        ]
        for t in texts:
            assert ch._sentence_pass(t) == naive_sentence_pass(t)

    def test_carried_word_counts_match_full_rescan(self):
        """split_child_counted carries word counts through every pass;
        they must equal a fresh word_count() of each emitted chunk."""
        from financial_rag_tpu.ingest.chunker import word_count

        cfg = ChunkingConfig()
        cfg.child_max_tokens = 25
        cfg.child_overlap_words = 4
        ch = ParentChildChunker(cfg)
        cases = [
            "Rent: 42,800.00 (year one). Lock-in 36 months! GST @18%? " * 10,
            "\n".join(f"row{i} | value-{i} | 100.{i}" for i in range(30)),  # line pass
            " ".join(f"w{i}" for i in range(200)),                           # hard pass
        ]
        for text in cases:
            pairs = ch.split_child_counted(text)
            assert pairs and all(wc == word_count(c) for c, wc in pairs)
            assert [c for c, _ in pairs] == ch.split_child_texts(text)

    def test_parent_token_count_matches_full_rescan(self):
        cfg = ChunkingConfig()
        cfg.parent_max_tokens = 60
        ch = ParentChildChunker(cfg)
        blocks = [{"content": f"Amount {i}: 1,234.56 (incl. GST) — due now. " * 3,
                   "page": i} for i in range(8)]
        for p in ch.make_parents(blocks, "doc"):
            assert p.token_count == token_estimate(p.content)

    def test_full_chunk_ids_unique(self):
        ch = ParentChildChunker()
        blocks = [{"content": self._prose(40), "page": 0}]
        parents, children = ch.chunk(blocks, "doc1")
        ids = [p.parent_id for p in parents] + [c.child_id for c in children]
        assert len(set(ids)) == len(ids)
        parent_ids = {p.parent_id for p in parents}
        assert all(c.parent_id in parent_ids for c in children)


@pytest.fixture
def pipeline(tmp_path):
    enc = DualEncoder({
        "baai": HashingEncoder(dim=128, salt=1),
        "gte": HashingEncoder(dim=128, salt=2),
    })
    indexes = {name: FlatIndex(dim=128, capacity=1024, name=collection_slug(name))
               for name in enc.names}
    return IngestionPipeline(
        enc,
        ParentStore(tmp_path / "parents.db"),
        ChildMetaStore(tmp_path / "children.db"),
        indexes,
        chunk_logs_dir=tmp_path / "chunk_logs",
    )


class TestPipeline:
    def test_ingest_reference_fixture(self, pipeline, tmp_path, reference_fixture_json):
        src = tmp_path / "cn22-23.json"
        src.write_text(json.dumps(reference_fixture_json))
        stats = pipeline.ingest_extracted_json(src, "cn22-23")
        assert stats["parents"] >= 1
        assert stats["children"] >= 1
        assert pipeline.parent_store.count() == stats["parents"]
        assert pipeline.child_meta.count() == stats["children"]
        for idx in pipeline.indexes.values():
            assert idx.count() == stats["children"]
        # chunk log written
        log_file = tmp_path / "chunk_logs" / "cn22-23_parent_child_chunks.json"
        assert log_file.exists()
        payload = json.loads(log_file.read_text())
        assert payload["children"] == stats["children"]

        # retrieval smoke: a lexical query should hit a chunk containing it
        q = pipeline.dual_encoder.encoders["baai"].encode(["credit note number dated"])
        ids, scores = pipeline.indexes["baai"].search(q, top_k=3)
        metas = pipeline.child_meta.get_children(ids[0].tolist())
        joined = " ".join(m["snippet"] for m in metas.values())
        assert "Credit Note" in joined

    def test_remove_document(self, pipeline, tmp_path):
        src = tmp_path / "d.json"
        src.write_text(json.dumps({"blocks": [
            {"content": "The lease rent for the first year is Rs 40,000 per month. " * 20, "page": 0}]}))
        pipeline.ingest_extracted_json(src, "docA")
        assert pipeline.child_meta.count() > 0
        out = pipeline.remove_document("docA")
        assert out["children_removed"] > 0
        assert pipeline.child_meta.count() == 0
        assert pipeline.parent_store.count() == 0
        for idx in pipeline.indexes.values():
            assert idx.count() == 0

    def test_ingest_directory_skips_meta_and_errors(self, pipeline, tmp_path):
        d = tmp_path / "docs"
        d.mkdir()
        (d / "a.json").write_text(json.dumps({"blocks": [{"content": "alpha beta gamma. " * 30, "page": 0}]}))
        (d / "a_meta.json").write_text("{}")
        (d / "broken.json").write_text("{not json")
        results = pipeline.ingest_directory(d)
        assert len(results) == 2  # a.json + broken.json, meta skipped
        by_doc = {r["document_id"]: r for r in results}
        assert "error" in by_doc["broken"]
        assert by_doc["a"]["children"] >= 1
