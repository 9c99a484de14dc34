"""Native C++ components: exact parity with the pure-Python implementations."""

import numpy as np
import pytest

from financial_rag_tpu import native
from financial_rag_tpu.retrieval.bm25 import BM25
from financial_rag_tpu.tokenizer import WordPieceTokenizer
from financial_rag_tpu.tokenizer.vocab import inverse_vocab, load_vocab

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built (no C++ toolchain)")

ASCII_CASES = [
    "What is the rent for the first year?",
    "Invoice INV-2022/23-0042 dated 30-Jul-22 for Rs. 42,800.00 (incl. GST @18%)",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "numbers 1234567890 3.14159 1,000,000.00 $1.2M",
    "punctuation!!! (parentheses) {braces} a-b-c e.g., etc.;",
    "UPPER lower MiXeD\t\ttabs\nnewlines   spaces",
    "x" * 150,  # long-word -> UNK
    "a",
    "del\x7fchar splits\x7f like control",  # DEL is Cc: stripped, not kept in-word
    "bell\x07 and\x1f unit separators",
]


@pytest.fixture(scope="module")
def py_tok():
    return WordPieceTokenizer(use_native=False)


@pytest.fixture(scope="module")
def nat():
    return native.NativeWordPiece(inverse_vocab(load_vocab()))


class TestNativeWordPiece:
    @pytest.mark.parametrize("text", ASCII_CASES)
    @pytest.mark.smoke
    def test_parity_with_python(self, py_tok, nat, text):
        expected = py_tok.convert_tokens_to_ids(py_tok.tokenize(text))
        assert nat.tokenize_ids(text) == expected

    def test_batch_matches_single(self, nat):
        outs = nat.tokenize_ids_batch(ASCII_CASES, max_out=510)
        for text, ids in zip(ASCII_CASES, outs):
            assert ids == nat.tokenize_ids(text)[:510]

    @pytest.mark.smoke
    def test_tokenizer_integration_routes_native(self):
        tok = WordPieceTokenizer(use_native=True)
        ref = WordPieceTokenizer(use_native=False)
        for text in ASCII_CASES:
            assert tok.encode(text) == ref.encode(text)
        # non-ASCII routes through Python and still matches
        uni = "café 北京 naïve résumé"
        assert tok.encode(uni) == ref.encode(uni)
        assert tok._native is not None  # fast path actually engaged

    def test_throughput_sane(self, nat):
        import time

        texts = ["The rent for year two is Rs 42,800 per month including GST. " * 20] * 200
        t0 = time.perf_counter()
        nat.tokenize_ids_batch(texts, max_out=510)
        native_dt = time.perf_counter() - t0
        assert native_dt < 2.0  # ~50k+ tokens well under 2s


class TestNativeBM25:
    CORPUS = [
        "the rent amount is forty thousand rupees",
        "gst tax at eighteen percent applies to the invoice",
        "lock in period of thirty six months",
        "the weather is mild in paris in spring",
        "rent rent rent repeated term document",
    ]

    @pytest.mark.smoke
    def test_parity_with_python(self):
        nb = native.NativeBM25(self.CORPUS)
        pb = BM25([t.split() for t in self.CORPUS])
        for q in ["rent amount", "gst invoice", "the", "missing words entirely", "rent"]:
            np.testing.assert_allclose(nb.get_scores(q), pb.get_scores(q.split()),
                                       rtol=1e-5, atol=1e-6)

    def test_empty_query(self):
        nb = native.NativeBM25(self.CORPUS)
        assert nb.get_scores("").sum() == 0.0
