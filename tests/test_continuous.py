"""Continuous-batching decode engine (llm/continuous.py).

The correctness bar: a stream that JOINS the shared batched decode mid-
flight must emit exactly the tokens batch-1 greedy `generate_tokens` would
(trimmed at eos) — in f32 on CPU that equality is exact. Plus admission
control (reject-don't-queue), window reset on drain, and the serving
routing (BatchingLLM direct lane below the threshold, engine above).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from financial_rag_tpu.models.decoder import (
    DecoderConfig,
    generate_tokens,
    random_decoder_params,
)


def _tiny_cfg(eos=5):
    return DecoderConfig(vocab_size=97, num_layers=2, hidden_size=32,
                         num_heads=4, num_kv_heads=2, intermediate_size=64,
                         eos_token_id=eos, attention_bias=True)


def _prompt(rng, cfg, s_real, bucket):
    ids = np.full((1, bucket), cfg.eos_token_id, np.int32)
    mask = np.zeros((1, bucket), np.int32)
    toks = rng.integers(6, cfg.vocab_size, size=s_real).astype(np.int32)
    ids[0, bucket - s_real:] = toks
    mask[0, bucket - s_real:] = 1
    return ids, mask


def _reference(params, cfg, ids, mask, cap):
    """Batch-1 greedy reference, trimmed at eos, capped at `cap`."""
    import jax
    toks = np.asarray(generate_tokens(
        params, jnp.asarray(ids), jnp.asarray(mask), jax.random.PRNGKey(0),
        cfg=cfg, max_new_tokens=cap, temperature=0.0))[0].tolist()
    if cfg.eos_token_id in toks:
        toks = toks[: toks.index(cfg.eos_token_id)]
    return toks


def _drain(it):
    out = []
    for block in it:
        assert block.ndim == 2 and block.shape[0] == 1
        out.extend(block[0].tolist())
    return out


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_cfg()
    params = random_decoder_params(cfg, seed=11)
    return cfg, params


class TestEngineParity:
    @pytest.mark.smoke
    def test_solo_stream_matches_batch1_greedy(self, setup):
        from financial_rag_tpu.llm.continuous import ContinuousDecodeEngine
        cfg, params = setup
        eng = ContinuousDecodeEngine(params, cfg, rows=4, t_prompt=16,
                                     window=32, segment=4)
        try:
            rng = np.random.default_rng(0)
            ids, mask = _prompt(rng, cfg, s_real=9, bucket=16)
            got = _drain(eng.submit(ids, mask, 12))
            want = _reference(params, cfg, ids, mask, 12)
            assert got == want
            assert eng.stats()["joins"] == 1
        finally:
            eng.close()

    def test_staggered_join_matches_each_solo_reference(self, setup):
        """A stream that joins while another is mid-generation emits the
        same tokens as its own batch-1 run — the shared cache layout, the
        per-row masks and the per-row rotary positions leak nothing."""
        from financial_rag_tpu.llm.continuous import ContinuousDecodeEngine
        cfg, params = setup
        eng = ContinuousDecodeEngine(params, cfg, rows=4, t_prompt=16,
                                     window=64, segment=4)
        try:
            rng = np.random.default_rng(1)
            ids_a, mask_a = _prompt(rng, cfg, s_real=12, bucket=16)
            ids_b, mask_b = _prompt(rng, cfg, s_real=5, bucket=8)
            it_a = eng.submit(ids_a, mask_a, 20)
            first_a = next(it_a)                 # A is live before B joins
            it_b = eng.submit(ids_b, mask_b, 20)
            got_a = first_a[0].tolist() + _drain(it_a)
            got_b = _drain(it_b)
            assert got_a == _reference(params, cfg, ids_a, mask_a, 20)
            assert got_b == _reference(params, cfg, ids_b, mask_b, 20)
            assert eng.stats()["joins"] == 2
        finally:
            eng.close()

    def test_many_concurrent_streams(self, setup):
        from financial_rag_tpu.llm.continuous import ContinuousDecodeEngine
        cfg, params = setup
        eng = ContinuousDecodeEngine(params, cfg, rows=4, t_prompt=16,
                                     window=96, segment=4)
        try:
            rng = np.random.default_rng(2)
            prompts = [_prompt(rng, cfg, s_real=4 + i, bucket=16)
                       for i in range(4)]
            its = [eng.submit(ids, mask, 10) for ids, mask in prompts]
            for (ids, mask), it in zip(prompts, its):
                assert _drain(it) == _reference(params, cfg, ids, mask, 10)
        finally:
            eng.close()


class TestSpeculativeBlocks:
    def test_spec_engine_matches_greedy_reference(self, setup):
        """Speculative blocks (prompt-lookup drafts + shared verify) must
        emit exactly the greedy token sequence — acceptance affects speed,
        never content. The window is sized so spec blocks actually run."""
        from financial_rag_tpu.llm.continuous import ContinuousDecodeEngine
        cfg, params = setup
        eng = ContinuousDecodeEngine(params, cfg, rows=4, t_prompt=16,
                                     window=128, segment=4, spec_k=4)
        try:
            rng = np.random.default_rng(20)
            ids, mask = _prompt(rng, cfg, s_real=10, bucket=16)
            got = _drain(eng.submit(ids, mask, 24))
            assert got == _reference(params, cfg, ids, mask, 24)
            st = eng.stats()
            assert st["spec_blocks"] > 0, f"spec never engaged: {st}"
        finally:
            eng.close()

    def test_spec_staggered_join_parity(self, setup):
        """A stream that joins while spec blocks are running must still
        emit its own batch-1 greedy sequence: rejected-slot masking and
        per-row draft histories leak nothing across rows."""
        from financial_rag_tpu.llm.continuous import ContinuousDecodeEngine
        cfg, params = setup
        eng = ContinuousDecodeEngine(params, cfg, rows=4, t_prompt=16,
                                     window=256, segment=4, spec_k=4)
        try:
            rng = np.random.default_rng(21)
            ids_a, mask_a = _prompt(rng, cfg, s_real=12, bucket=16)
            ids_b, mask_b = _prompt(rng, cfg, s_real=6, bucket=8)
            it_a = eng.submit(ids_a, mask_a, 20)
            first_a = next(it_a)
            it_b = eng.submit(ids_b, mask_b, 20)
            got_a = first_a[0].tolist() + _drain(it_a)
            got_b = _drain(it_b)
            assert got_a == _reference(params, cfg, ids_a, mask_a, 20)
            assert got_b == _reference(params, cfg, ids_b, mask_b, 20)
            assert eng.stats()["spec_blocks"] > 0
        finally:
            eng.close()

    def test_spec_falls_back_to_greedy_near_window_end(self, setup):
        """Window slots burn at blk per spec block; when one more block
        could strand a live row the engine must finish on greedy segments
        — and the stream still completes with the exact greedy tokens."""
        from financial_rag_tpu.llm.continuous import ContinuousDecodeEngine
        cfg, params = setup
        # window 24, cap 20, blk 6: after at most one spec block the
        # remaining slots force the greedy tail
        eng = ContinuousDecodeEngine(params, cfg, rows=2, t_prompt=16,
                                     window=24, segment=4, spec_k=5)
        try:
            rng = np.random.default_rng(22)
            ids, mask = _prompt(rng, cfg, s_real=8, bucket=8)
            got = _drain(eng.submit(ids, mask, 20))
            assert got == _reference(params, cfg, ids, mask, 20)
            st = eng.stats()
            assert st["segments"] > 0, f"greedy tail never ran: {st}"
        finally:
            eng.close()

    def test_spec_zero_disables(self, setup):
        from financial_rag_tpu.llm.continuous import ContinuousDecodeEngine
        cfg, params = setup
        eng = ContinuousDecodeEngine(params, cfg, rows=2, t_prompt=16,
                                     window=32, segment=4, spec_k=0)
        try:
            assert eng._spec_fn is None
            rng = np.random.default_rng(23)
            ids, mask = _prompt(rng, cfg, s_real=6, bucket=8)
            got = _drain(eng.submit(ids, mask, 12))
            assert got == _reference(params, cfg, ids, mask, 12)
            assert eng.stats()["spec_blocks"] == 0
        finally:
            eng.close()


class TestHardening:
    def test_window_rounds_down_to_segment_multiple(self, setup):
        """A window that isn't a segment multiple must be rounded down so
        the last segment never issues cache writes past t_total (where
        dynamic_update_slice clamping would corrupt the final slot)."""
        from financial_rag_tpu.llm.continuous import ContinuousDecodeEngine
        cfg, params = setup
        eng = ContinuousDecodeEngine(params, cfg, rows=2, t_prompt=16,
                                     window=18, segment=4)
        try:
            assert eng.window == 16
            assert eng.t_total == 32
            rng = np.random.default_rng(9)
            ids, mask = _prompt(rng, cfg, s_real=6, bucket=8)
            got = _drain(eng.submit(ids, mask, 16))
            assert got == _reference(params, cfg, ids, mask, 16)
        finally:
            eng.close()

    def test_prefill_failure_fails_one_stream_not_engine(self, setup):
        """A joiner whose prefill blows up must fail only its own stream;
        the worker stays alive and later submissions stream normally."""
        from financial_rag_tpu.llm.continuous import ContinuousDecodeEngine
        cfg, params = setup
        eng = ContinuousDecodeEngine(params, cfg, rows=2, t_prompt=16,
                                     window=32, segment=4)
        try:
            def boom(bucket):
                def fn(*a, **k):
                    raise ValueError("transient prefill failure")
                return fn
            real = eng._prefill_for
            eng._prefill_for = boom
            rng = np.random.default_rng(10)
            ids, mask = _prompt(rng, cfg, s_real=6, bucket=8)
            it = eng.submit(ids, mask, 8)
            assert it is not None
            with pytest.raises(RuntimeError):
                _drain(it)
            eng._prefill_for = real
            got = _drain(eng.submit(ids, mask, 8))
            assert got == _reference(params, cfg, ids, mask, 8)
        finally:
            eng.close()

    def test_window_race_raises_typed_error_before_first_token(self, setup):
        """_REJECTED surfaces as WindowRacedError so the serving layer can
        distinguish zero-emitted races (clean fallback) from mid-stream
        failures (regeneration path)."""
        from financial_rag_tpu.llm.continuous import (
            _REJECTED, ContinuousDecodeEngine, WindowRacedError)
        cfg, params = setup
        eng = ContinuousDecodeEngine(params, cfg, rows=2, t_prompt=16,
                                     window=32, segment=4)
        try:
            from financial_rag_tpu.llm.continuous import _Stream
            s = _Stream(cap=8)
            s.q.put(_REJECTED)
            with pytest.raises(WindowRacedError):
                next(eng._iter_blocks(s))
        finally:
            eng.close()


class TestAdmission:
    def test_oversize_cap_and_prompt_rejected(self, setup):
        from financial_rag_tpu.llm.continuous import ContinuousDecodeEngine
        cfg, params = setup
        eng = ContinuousDecodeEngine(params, cfg, rows=2, t_prompt=16,
                                     window=8, segment=4)
        try:
            rng = np.random.default_rng(3)
            ids, mask = _prompt(rng, cfg, s_real=4, bucket=8)
            assert eng.submit(ids, mask, 9) is None      # cap > window
            wide, wmask = _prompt(rng, cfg, s_real=20, bucket=32)
            assert eng.submit(wide, wmask, 4) is None    # prompt > t_prompt
        finally:
            eng.close()

    def test_window_resets_after_drain(self, setup):
        """Spend most of the window, drain, then a fresh request must be
        admitted again (the write head resets for free on empty)."""
        from financial_rag_tpu.llm.continuous import ContinuousDecodeEngine
        cfg, params = setup
        eng = ContinuousDecodeEngine(params, cfg, rows=2, t_prompt=16,
                                     window=16, segment=4)
        try:
            rng = np.random.default_rng(4)
            ids, mask = _prompt(rng, cfg, s_real=6, bucket=8)
            for round_i in range(3):             # each spends 12 of 16 slots
                got = _drain(eng.submit(ids, mask, 12))
                assert got == _reference(params, cfg, ids, mask, 12)
        finally:
            eng.close()

    def test_close_fails_live_streams_loudly(self, setup):
        from financial_rag_tpu.llm.continuous import ContinuousDecodeEngine
        cfg, params = setup
        eng = ContinuousDecodeEngine(params, cfg, rows=2, t_prompt=16,
                                     window=64, segment=4)
        rng = np.random.default_rng(5)
        ids, mask = _prompt(rng, cfg, s_real=6, bucket=8)
        it = eng.submit(ids, mask, 40)
        next(it)                                  # stream is live
        eng.close()
        with pytest.raises(RuntimeError):
            for _ in it:
                pass


class TestLocalLLMIntegration:
    @pytest.fixture(scope="class")
    def llm(self, tmp_path_factory):
        import json
        import torch
        import transformers
        from tokenizers import Tokenizer, models as tok_models, pre_tokenizers

        d = tmp_path_factory.mktemp("cont_llm")
        torch.manual_seed(3)
        hf = transformers.Qwen2Config(
            vocab_size=256, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=64, tie_word_embeddings=True,
            eos_token_id=250, bos_token_id=250)
        with torch.no_grad():
            transformers.Qwen2ForCausalLM(hf).save_pretrained(str(d))
        vocab = {f"w{i}": i for i in range(240)}
        vocab.update({"<unk>": 240, "<|im_start|>": 241, "<|im_end|>": 242,
                      "user": 243, "assistant": 244})
        tok = Tokenizer(tok_models.WordLevel(vocab, unk_token="<unk>"))
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        tok.save(str(d / "tokenizer.json"))
        (d / "tokenizer_config.json").write_text(json.dumps(
            {"chat_template": "{% for m in messages %}<|im_start|>...{% endfor %}"}))

        from financial_rag_tpu.config import LLMConfig
        from financial_rag_tpu.llm.local_llm import LocalLLM
        cfg = LLMConfig(local_checkpoint=str(d), local_max_new_tokens=16,
                        local_continuous_rows=4, local_continuous_window=64)
        llm = LocalLLM(cfg, model_dir=str(d), dtype="float32",
                       max_prompt_tokens=128)
        yield llm
        if llm._engine is not None:
            llm._engine.close()

    def test_engine_text_matches_per_request_stream(self, llm):
        prompt = "w1 w2 w3 what is the rent"
        via = llm.stream_via_engine(prompt, max_tokens=12)
        assert via is not None
        engine_text = "".join(via)
        stream_text = "".join(llm.generate_stream(prompt, max_tokens=12))
        assert engine_text == stream_text

    def test_engine_disabled_returns_none(self, llm):
        old = llm.cfg.local_continuous_rows
        llm.cfg.local_continuous_rows = 0
        try:
            assert llm.stream_via_engine("w1 w2", max_tokens=4) is None
        finally:
            llm.cfg.local_continuous_rows = old

    def test_batching_llm_routes_by_concurrency(self, llm):
        from financial_rag_tpu.serving.batcher import ActiveCount, BatchingLLM

        prompt = "w5 w6 w7 total amount due"
        want = "".join(llm.generate_stream(prompt, max_tokens=8))

        gauge = ActiveCount()
        wrapped = BatchingLLM(llm, direct=2, active=gauge)
        # below the threshold: the per-request path, no engine involvement
        low = "".join(wrapped.generate_stream(prompt, max_tokens=8))
        assert low == want and wrapped.engine_streams == 0
        # above it: the engine path, same text
        for _ in range(3):
            gauge.enter()
        try:
            high = "".join(wrapped.generate_stream(prompt, max_tokens=8))
        finally:
            for _ in range(3):
                gauge.leave()
        assert high == want and wrapped.engine_streams == 1

    def test_window_race_falls_back_to_per_request_stream(self, llm):
        """A stream whose engine admission races away before the first
        token must silently fall back to the inner per-request stream —
        the user still gets a streamed answer, not an error."""
        from financial_rag_tpu.llm.continuous import WindowRacedError
        from financial_rag_tpu.serving.batcher import ActiveCount, BatchingLLM

        prompt = "w8 w9 the lock in period"
        want = "".join(llm.generate_stream(prompt, max_tokens=8))

        def raced(prompt, *, max_tokens):
            def gen():
                raise WindowRacedError("window exhausted")
                yield  # pragma: no cover
            return gen()

        gauge = ActiveCount()
        wrapped = BatchingLLM(llm, direct=1, active=gauge)
        wrapped.inner.stream_via_engine = raced
        for _ in range(2):
            gauge.enter()
        try:
            got = "".join(wrapped.generate_stream(prompt, max_tokens=8))
        finally:
            for _ in range(2):
                gauge.leave()
            del wrapped.inner.stream_via_engine
        assert got == want and wrapped.engine_streams == 1

    def test_owned_gauge_streams_see_each_other(self, llm):
        """In owned-gauge mode concurrent streams must raise the count so
        the continuous engine can engage: a second stream opened while the
        first is still being consumed routes via the engine."""
        from financial_rag_tpu.serving.batcher import BatchingLLM

        prompt = "w10 w11 gst amount"
        want = "".join(llm.generate_stream(prompt, max_tokens=8))

        wrapped = BatchingLLM(llm, direct=1)       # no gauge passed: owned
        g1 = wrapped.generate_stream(prompt, max_tokens=8)
        first = next(g1)                           # g1 holds the gauge now
        high = "".join(wrapped.generate_stream(prompt, max_tokens=8))
        rest = "".join(g1)
        assert first + rest == want
        assert high == want and wrapped.engine_streams == 1
