"""WordPiece tokenizer: exact parity with HuggingFace BertTokenizer.

Recall parity of the whole system depends on tokenization fidelity
(SURVEY.md §7.3 'Tokenizer fidelity').
"""

import numpy as np
import pytest

from financial_rag_tpu.tokenizer import WordPieceTokenizer, load_vocab

CASES = [
    "What is the rent for the first year?",
    "Invoice INV-2022/23-0042 dated 30-Jul-22 for Rs. 42,800.00 (incl. GST @18%)",
    "The lessor, M/s Bhartiya Enterprises, agrees to a lock-in period of 36 months.",
    "  multiple   spaces\tand\nnewlines  ",
    "CamelCase WORDS lowercase ÀçcéntÉd résumé naïve",
    "unicode: 北京 tokyo 東京 mixed with english",
    "punctuation!!! (parentheses) [brackets] {braces} a-b-c e.g., etc.;",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "numbers 1234567890 3.14159 1,000,000.00 ₹500 $1.2M",
    "email-like foo.bar@example.com and url http://example.com/x?y=1",
    "emoji 🚀 and symbols © ® ™ ± µ",
    "",
    "a",
    "[CLS] should not be treated specially mid-text? actually HF splits it",
]


@pytest.fixture(scope="module")
def tok():
    return WordPieceTokenizer()


@pytest.fixture(scope="module")
def hf_tok(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    import gzip
    from financial_rag_tpu.tokenizer.vocab import default_vocab_path

    d = tmp_path_factory.mktemp("hfvocab")
    vocab_txt = d / "vocab.txt"
    with gzip.open(default_vocab_path(), "rt", encoding="utf-8") as f:
        vocab_txt.write_text(f.read(), encoding="utf-8")
    return transformers.BertTokenizer(str(vocab_txt), do_lower_case=True)


@pytest.mark.parametrize("text", [c for c in CASES if c.strip()])
def test_tokenize_parity(tok, hf_tok, text):
    assert tok.tokenize(text) == hf_tok.tokenize(text)


@pytest.mark.parametrize("text", [c for c in CASES if c.strip()])
def test_encode_parity(tok, hf_tok, text):
    ours = tok.encode(text, max_len=512)
    theirs = hf_tok.encode(text, truncation=True, max_length=512)
    assert ours == theirs


@pytest.mark.smoke
def test_encode_pair_parity(tok, hf_tok):
    a = "What is the GST amount on the invoice?"
    b = "The invoice total is Rs. 42,800 including GST of Rs. 6,528 at 18 percent." * 30
    ours_ids, ours_types = tok.encode_pair(a, b, max_len=128)
    enc = hf_tok(a, b, truncation=True, max_length=128)
    assert ours_ids == enc["input_ids"]
    assert ours_types == enc["token_type_ids"]


@pytest.mark.smoke
def test_encode_batch_shapes(tok):
    out = tok.encode_batch(["short", "a slightly longer sentence about invoices"], max_len=512)
    assert out["input_ids"].shape == out["attention_mask"].shape
    assert out["input_ids"].shape[1] % 64 == 0
    assert out["input_ids"].dtype == np.int32
    # row 0: [CLS] short [SEP] then PAD
    assert out["attention_mask"][0].sum() == 3


def test_long_word_becomes_unk(tok):
    pieces = tok.tokenize("x" * 200)
    assert pieces == ["[UNK]"]


def test_empty_text(tok):
    assert tok.tokenize("") == []
    ids = tok.encode("", max_len=512)
    assert ids == [tok.cls_id, tok.sep_id]


def test_vocab_size():
    assert len(load_vocab()) == 30522


def test_fuzz_parity_random_ascii(tok, hf_tok):
    """Property test: random printable-ASCII strings tokenize identically
    to HF across lengths and character mixes."""
    import random
    import string

    rnd = random.Random(0)
    alphabet = string.ascii_letters + string.digits + string.punctuation + "  \t\n"
    for _ in range(200):
        n = rnd.randint(1, 120)
        text = "".join(rnd.choice(alphabet) for _ in range(n))
        if not text.strip():
            continue
        assert tok.encode(text, max_len=128) == hf_tok.encode(
            text, truncation=True, max_length=128), repr(text)


def test_fuzz_parity_unicode_mix(tok, hf_tok):
    """Mixed-script fuzz: accents, CJK, symbols, emoji."""
    import random

    rnd = random.Random(1)
    pieces = ["café", "北京", "naïve", "résumé", "Ω≈ç√", "🚀", "händl",
              "invoice", "42,800.00", "GST@18%", "--", "…", "ﬁ", "ß",
              "Ñandú", "東京都", " ", "á"]
    for _ in range(100):
        text = " ".join(rnd.choices(pieces, k=rnd.randint(1, 12)))
        assert tok.encode(text, max_len=128) == hf_tok.encode(
            text, truncation=True, max_length=128), repr(text)


def test_encode_many_matches_per_text(tok):
    """Batch paths (native C++ batch + Python fallback mix) must be
    identical to per-text encode(), including truncation and the packed
    fixed-shape variant the encoder consumes."""
    texts = [
        "Invoice total 42,800.00 incl. GST @18% due 2023-04-01",
        "café résumé naïve — 北京 東京都",          # non-ASCII -> Python path
        "plain ascii rent lease lock-in period " * 40,  # forces truncation
        "",
        "[CLS] bracketed text avoids the native path",
        "short",
    ]
    max_len = 64
    expected = [tok.encode(t, max_len=max_len) for t in texts]
    assert tok.encode_many(texts, max_len=max_len) == expected

    ids, lens = tok.encode_many_packed(texts, max_len=max_len)
    assert ids.shape == (len(texts), max_len) and ids.dtype == np.int32
    for i, e in enumerate(expected):
        assert lens[i] == len(e)
        assert ids[i, : len(e)].tolist() == e
        assert (ids[i, len(e):] == tok.pad_id).all()
