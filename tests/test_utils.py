import time

import pytest

from financial_rag_tpu.config import FrameworkConfig, sanitize_for_json
from financial_rag_tpu.utils import (
    QueryAnalyzer,
    RateLimiter,
    TimingLogger,
    assess_chunk_quality,
    safe_divide,
    safe_mean,
    validate_and_sanitize_query,
)
from financial_rag_tpu.utils.sanitize import QueryValidationError


@pytest.mark.smoke
def test_sanitize_strips_script():
    q = validate_and_sanitize_query("rent <script>alert(1)</script> amount")
    assert "script" not in q
    assert "rent" in q and "amount" in q


def test_sanitize_rejects_empty_and_long():
    with pytest.raises(QueryValidationError):
        validate_and_sanitize_query("   ")
    with pytest.raises(QueryValidationError):
        validate_and_sanitize_query("x" * 2000)
    with pytest.raises(QueryValidationError):
        validate_and_sanitize_query(123)


def test_analyzer_intents():
    qa = QueryAnalyzer()
    assert qa.analyze("What is the total invoice amount?").intent in ("aggregation", "amount")
    assert qa.analyze("Who is the lessor?").intent == "entity"
    assert qa.analyze("hello").complexity == "simple"
    assert qa.analyze("compare the rent for year one and year two, and the GST, and the lock-in").complexity == "complex"


def test_rate_limiter():
    rl = RateLimiter(max_calls=2, window_s=10.0)
    t0 = 100.0
    assert rl.allow(t0)
    assert rl.allow(t0 + 1)
    assert not rl.allow(t0 + 2)
    assert rl.allow(t0 + 11)  # window slid


def test_timing_logger():
    tl = TimingLogger()
    with tl.block("step"):
        time.sleep(0.01)
    s = tl.summary()
    assert "step" in s and s["step"]["count"] == 1
    assert s["step"]["total_s"] > 0


def test_misc_helpers():
    assert safe_mean([]) == 0.0
    assert safe_mean([1, 3]) == 2.0
    assert safe_divide(1, 0) == 0.0
    assert assess_chunk_quality("rent amount", "the rent amount is 42800") == 1.0
    assert assess_chunk_quality("rent", "") == 0.0


@pytest.mark.smoke
def test_config_tree_and_sanitize(monkeypatch):
    import numpy as np

    monkeypatch.setenv("PARENT_MAX_TOKENS", "999")
    cfg = FrameworkConfig.from_env()
    assert cfg.chunking.parent_max_tokens == 999
    assert cfg.fusion.rrf_k == 60
    assert cfg.retrieval.top_parents == 3
    d = sanitize_for_json({"a": np.float32(1.5), "b": np.arange(3), "c": [np.int64(2)]})
    assert d == {"a": 1.5, "b": [0, 1, 2], "c": [2]}


def test_embedding_cache(tmp_path):
    import numpy as np

    from financial_rag_tpu.utils.embed_cache import EmbeddingCache

    c = EmbeddingCache(max_items=2, disk_dir=tmp_path)
    assert c.get("m", "hello") is None
    v = np.arange(4, dtype=np.float32)
    c.put("m", "hello", v)
    np.testing.assert_array_equal(c.get("m", "hello"), v)
    assert c.get("other_model", "hello") is None  # keyed per model
    # LRU eviction in memory, but disk still serves
    c.put("m", "b", v + 1)
    c.put("m", "c", v + 2)
    assert len(c._mem) == 2
    np.testing.assert_array_equal(c.get("m", "hello"), v)  # reloaded from disk
    assert c.stats()["hits"] == 2


def test_dual_encoder_cache_integration():
    import numpy as np

    from financial_rag_tpu.models.encoder import DualEncoder
    from financial_rag_tpu.models.hashing import HashingEncoder
    from financial_rag_tpu.utils.embed_cache import EmbeddingCache

    cache = EmbeddingCache()
    de = DualEncoder({"a": HashingEncoder(dim=32)}, cache=cache)
    t = ["query one", "query two"]
    first = de.encode_all(t, use_cache=True)["a"]
    second = de.encode_all(t, use_cache=True)["a"]
    np.testing.assert_array_equal(first, second)
    assert cache.stats()["hits"] == 2
    assert cache.stats()["misses"] == 2


def test_model_config_from_json():
    from financial_rag_tpu.config import ModelConfig
    import os
    p = "/root/reference/local_models/BAAI-bge-small-en-v1.5"
    if not os.path.exists(p):
        pytest.skip("reference models not available")
    mc = ModelConfig.from_json(p)
    assert mc.hidden_size == 384 and mc.num_layers == 12 and mc.vocab_size == 30522


def test_query_tracer_survives_deleted_dir(tmp_path):
    """A trace dir removed after the tracer's one-time mkdir (temp-dir
    cleanup, blue/green data-dir swap) must be recreated on the next write,
    not silently drop the trace."""
    import shutil

    from financial_rag_tpu.utils.tracing import QueryTracer

    d = tmp_path / "test_logs"
    tracer = QueryTracer(d, background=False)
    kw = dict(queries=["q"], children=[], parents=[], prompt="p", answer="a")
    assert tracer.write(question="first", **kw) is not None
    shutil.rmtree(d)
    p = tracer.write(question="second", **kw)
    assert p is not None and p.exists()
