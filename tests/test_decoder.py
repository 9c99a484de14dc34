"""Decoder LM parity vs torch/transformers and generation invariants.

The decoder (models/decoder.py) is this framework's on-device replacement
for the reference's external-LLM answer synthesis (reference
api_adapter.py:18-56). Parity here is against the HF implementations of
the SAME architectures its checkpoints come from (Qwen2/Llama), so a real
downloaded checkpoint is guaranteed bit-compatible modulo float order.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from financial_rag_tpu.models.decoder import (  # noqa: E402
    DecoderConfig,
    decoder_forward,
    decoder_params_from_torch_state_dict,
    generate_tokens,
    random_decoder_params,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_qwen2():
    from transformers import Qwen2Config, Qwen2ForCausalLM
    hf_cfg = Qwen2Config(
        vocab_size=211, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, eos_token_id=5,
        attention_dropout=0.0)
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = DecoderConfig.from_hf_config(hf_cfg.to_dict())
    params = decoder_params_from_torch_state_dict(model.state_dict(), cfg)
    return model, cfg, params


def _tiny_llama():
    from transformers import LlamaConfig, LlamaForCausalLM
    hf_cfg = LlamaConfig(
        vocab_size=173, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=True, eos_token_id=3,
        attention_bias=False, attention_dropout=0.0)
    torch.manual_seed(1)
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = DecoderConfig.from_hf_config(hf_cfg.to_dict())
    params = decoder_params_from_torch_state_dict(model.state_dict(), cfg)
    return model, cfg, params


class TestLogitsParity:
    def test_qwen2_logits_match_transformers(self):
        """GQA + qkv biases + untied head (Qwen2ForCausalLM)."""
        model, cfg, params = _tiny_qwen2()
        rng = np.random.default_rng(0)
        ids = rng.integers(1, cfg.vocab_size, (2, 11))
        with torch.no_grad():
            ref = model(torch.tensor(ids)).logits.numpy()
        got = np.asarray(decoder_forward(params, jnp.asarray(ids, jnp.int32), cfg))
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)

    def test_llama_tied_embeddings_logits_match(self):
        """MHA + no biases + tied lm_head (LlamaForCausalLM)."""
        model, cfg, params = _tiny_llama()
        assert cfg.tie_embeddings and not cfg.attention_bias
        rng = np.random.default_rng(1)
        ids = rng.integers(1, cfg.vocab_size, (1, 17))
        with torch.no_grad():
            ref = model(torch.tensor(ids)).logits.numpy()
        got = np.asarray(decoder_forward(params, jnp.asarray(ids, jnp.int32), cfg))
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)

    def test_left_padded_batch_matches_transformers(self):
        """Left padding (the serving batching layout) must not shift RoPE."""
        model, cfg, params = _tiny_qwen2()
        rng = np.random.default_rng(2)
        ids = rng.integers(1, cfg.vocab_size, (2, 10))
        am = np.ones((2, 10), np.int64)
        am[0, :4] = 0
        with torch.no_grad():
            ref = model(torch.tensor(ids), attention_mask=torch.tensor(am)).logits.numpy()
        got = np.asarray(decoder_forward(
            params, jnp.asarray(ids, jnp.int32), cfg, jnp.asarray(am, jnp.int32)))
        # compare only real-token positions (pad rows differ by convention)
        np.testing.assert_allclose(got[0, 4:], ref[0, 4:], atol=2e-4, rtol=2e-3)
        np.testing.assert_allclose(got[1], ref[1], atol=2e-4, rtol=2e-3)


class TestGeneration:
    def test_greedy_matches_transformers_generate(self):
        model, cfg, params = _tiny_qwen2()
        rng = np.random.default_rng(3)
        ids = rng.integers(1, cfg.vocab_size, (2, 8))
        with torch.no_grad():
            ref = model.generate(
                torch.tensor(ids), max_new_tokens=10, do_sample=False,
                eos_token_id=None, pad_token_id=0).numpy()[:, 8:]
        got = np.asarray(generate_tokens(
            params, jnp.asarray(ids, jnp.int32), jnp.ones((2, 8), jnp.int32),
            jax.random.PRNGKey(0), cfg=cfg, max_new_tokens=10))
        np.testing.assert_array_equal(got, ref)

    def test_greedy_with_left_padding_matches(self):
        model, cfg, params = _tiny_qwen2()
        rng = np.random.default_rng(4)
        ids = rng.integers(1, cfg.vocab_size, (2, 9))
        am = np.ones((2, 9), np.int64)
        ids[1, :3] = 0
        am[1, :3] = 0
        with torch.no_grad():
            ref = model.generate(
                torch.tensor(ids), attention_mask=torch.tensor(am),
                max_new_tokens=7, do_sample=False,
                eos_token_id=None, pad_token_id=0).numpy()[:, 9:]
        got = np.asarray(generate_tokens(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray(am, jnp.int32),
            jax.random.PRNGKey(0), cfg=cfg, max_new_tokens=7))
        np.testing.assert_array_equal(got, ref)

    def test_pallas_prefill_matches_xla_prefill(self):
        """prefill_impl='pallas' (ops/causal_flash.py, interpret mode on
        CPU) must generate the exact same greedy tokens as the XLA prefill,
        including under left padding — the serving layout."""
        _, cfg, params = _tiny_qwen2()
        rng = np.random.default_rng(11)
        ids = rng.integers(1, cfg.vocab_size, (2, 16))
        am = np.ones((2, 16), np.int64)
        ids[1, :5] = 0
        am[1, :5] = 0
        args = (params, jnp.asarray(ids, jnp.int32), jnp.asarray(am, jnp.int32),
                jax.random.PRNGKey(0))
        want = np.asarray(generate_tokens(*args, cfg=cfg, max_new_tokens=8,
                                          prefill_impl="xla"))
        got = np.asarray(generate_tokens(*args, cfg=cfg, max_new_tokens=8,
                                         prefill_impl="pallas"))
        np.testing.assert_array_equal(got, want)

    def test_pallas_prefill_matches_in_speculative_and_stream(self):
        from financial_rag_tpu.models.decoder import (
            generate_stream, generate_tokens_spec)
        _, cfg, params = _tiny_qwen2()
        rng = np.random.default_rng(12)
        ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (1, 16)), jnp.int32)
        am = jnp.ones((1, 16), jnp.int32)
        want, _ = generate_tokens_spec(params, ids, am, cfg=cfg,
                                       max_new_tokens=8, draft_k=3,
                                       prefill_impl="xla")
        got, _ = generate_tokens_spec(params, ids, am, cfg=cfg,
                                      max_new_tokens=8, draft_k=3,
                                      prefill_impl="pallas")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        sw = np.concatenate([np.asarray(b) for b in generate_stream(
            params, ids, am, jax.random.PRNGKey(0), cfg=cfg,
            max_new_tokens=8, segment=3, prefill_impl="pallas")], axis=1)
        sx = np.concatenate([np.asarray(b) for b in generate_stream(
            params, ids, am, jax.random.PRNGKey(0), cfg=cfg,
            max_new_tokens=8, segment=3, prefill_impl="xla")], axis=1)
        np.testing.assert_array_equal(sw, sx)

    def test_decode_steps_consistent_with_full_forward(self):
        """KV-cache decode must reproduce the no-cache forward's argmaxes."""
        cfg = DecoderConfig(vocab_size=131, num_layers=2, hidden_size=32,
                            num_heads=4, num_kv_heads=2, intermediate_size=64,
                            attention_bias=True, eos_token_id=0)
        params = random_decoder_params(cfg, seed=7)
        ids = np.random.default_rng(5).integers(1, 131, (1, 6))
        toks = np.asarray(generate_tokens(
            params, jnp.asarray(ids, jnp.int32), jnp.ones((1, 6), jnp.int32),
            jax.random.PRNGKey(0), cfg=cfg, max_new_tokens=5))[0]
        # replay: greedy from full forwards over the growing sequence
        seq = list(ids[0])
        for expect in toks:
            logits = decoder_forward(
                params, jnp.asarray([seq], jnp.int32), cfg)
            nxt = int(jnp.argmax(logits[0, -1]))
            assert nxt == int(expect)
            seq.append(nxt)

    @pytest.mark.smoke
    def test_eos_rows_keep_emitting_eos(self):
        """Once a row hits eos its tail is all eos, so host-side trimming is
        independent of max_new_tokens."""
        cfg = DecoderConfig(vocab_size=29, num_layers=1, hidden_size=16,
                            num_heads=2, num_kv_heads=2, intermediate_size=32,
                            eos_token_id=11)
        params = random_decoder_params(cfg, seed=0)
        ids = jnp.asarray([[1, 2, 3]], jnp.int32)
        short = np.asarray(generate_tokens(
            params, ids, jnp.ones((1, 3), jnp.int32), jax.random.PRNGKey(1),
            cfg=cfg, max_new_tokens=4))[0]
        long = np.asarray(generate_tokens(
            params, ids, jnp.ones((1, 3), jnp.int32), jax.random.PRNGKey(1),
            cfg=cfg, max_new_tokens=12))[0]

        def trim(t):
            t = list(t)
            return t[:t.index(cfg.eos_token_id)] if cfg.eos_token_id in t else t

        assert trim(long)[:len(trim(short))] == trim(short)
        if cfg.eos_token_id in list(long):
            i = list(long).index(cfg.eos_token_id)
            assert all(x == cfg.eos_token_id for x in long[i:])

    def test_sampling_deterministic_in_seed(self):
        cfg = DecoderConfig(vocab_size=53, num_layers=1, hidden_size=16,
                            num_heads=2, num_kv_heads=1, intermediate_size=32,
                            eos_token_id=0)
        params = random_decoder_params(cfg, seed=3)
        ids = jnp.asarray([[4, 9, 2]], jnp.int32)
        am = jnp.ones((1, 3), jnp.int32)
        a = np.asarray(generate_tokens(params, ids, am, jax.random.PRNGKey(9),
                                       cfg=cfg, max_new_tokens=8,
                                       temperature=0.8, top_k=10))
        b = np.asarray(generate_tokens(params, ids, am, jax.random.PRNGKey(9),
                                       cfg=cfg, max_new_tokens=8,
                                       temperature=0.8, top_k=10))
        c = np.asarray(generate_tokens(params, ids, am, jax.random.PRNGKey(10),
                                       cfg=cfg, max_new_tokens=8,
                                       temperature=0.8, top_k=10))
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c) or True  # different seed may collide


class TestLocalLLMProvider:
    """End-to-end: HF checkpoint dir on disk -> LocalLLM -> synthesize_answer."""

    @pytest.fixture(scope="class")
    def checkpoint_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("tiny_llm")
        model, cfg, _ = _tiny_qwen2()
        model.save_pretrained(str(d))          # config.json + model.safetensors
        from tokenizers import Tokenizer, models as tok_models, pre_tokenizers
        vocab = {f"w{i}": i for i in range(200)}
        vocab.update({"<unk>": 200, "<|im_start|>": 201, "<|im_end|>": 202})
        tok = Tokenizer(tok_models.WordLevel(vocab, unk_token="<unk>"))
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        tok.save(str(d / "tokenizer.json"))
        (d / "tokenizer_config.json").write_text(
            '{"chat_template": "{% for m in messages %}<|im_start|>..."}')
        return str(d)

    def test_provider_loads_and_generates(self, checkpoint_dir):
        from financial_rag_tpu.llm.local_llm import LocalLLM
        llm = LocalLLM(model_dir=checkpoint_dir, dtype="float32")
        assert llm.available()
        assert llm._chat == "chatml"
        out = llm.generate("w1 w2 w3 what is the rent", max_tokens=8)
        # random weights -> arbitrary tokens, but the call must return text
        # (or None only if the first token was eos)
        assert out is None or isinstance(out, str)

    def test_generate_is_deterministic(self, checkpoint_dir):
        from financial_rag_tpu.llm.local_llm import LocalLLM
        llm = LocalLLM(model_dir=checkpoint_dir, dtype="float32")
        a = llm.generate("w4 w5 w6", max_tokens=8)
        b = llm.generate("w4 w5 w6", max_tokens=8)
        assert a == b

    def test_get_provider_selects_local(self, checkpoint_dir, monkeypatch):
        monkeypatch.setenv("LLM_PROVIDER", "local")
        monkeypatch.setenv("LLM_CHECKPOINT", checkpoint_dir)
        from financial_rag_tpu.config import LLMConfig
        from financial_rag_tpu.llm import LocalLLM, get_provider
        provider = get_provider(LLMConfig())
        assert isinstance(provider, LocalLLM)

    def test_synthesize_answer_uses_local_llm(self, checkpoint_dir):
        from financial_rag_tpu.llm.local_llm import LocalLLM
        from financial_rag_tpu.llm.provider import synthesize_answer
        llm = LocalLLM(model_dir=checkpoint_dir, dtype="float32")
        parents = [{"content": "w7 w8 the rent is w9"}]
        ans = synthesize_answer(llm, "w1 w2", parents)
        assert isinstance(ans, str) and ans
        # with a working on-device LLM the degradation prefix must be absent
        # unless generation produced nothing (eos-first with random weights)
        if llm.generate("w1 w2", max_tokens=8):
            assert not ans.startswith("LLM unavailable")

    def test_max_tokens_is_the_cap_not_the_bucket(self, checkpoint_dir):
        # buckets round the DEVICE generation up (static shapes); the
        # caller-facing contract is max_tokens (LLM_MAX_NEW_TOKENS) — the
        # word-level tokenizer makes tokens == whitespace words here
        from financial_rag_tpu.llm.local_llm import LocalLLM
        llm = LocalLLM(model_dir=checkpoint_dir, dtype="float32")
        text = llm.generate("w1 w2 w3", max_tokens=3)
        assert text is None or len(text.split()) <= 3
        streamed = "".join(llm.generate_stream("w1 w2 w3", max_tokens=3))
        assert len(streamed.split()) <= 3
        for t in llm.generate_many(["w1 w2", "w3 w4"], max_tokens=3):
            assert t is None or len(t.split()) <= 3

    def test_missing_checkpoint_degrades_not_crashes(self, tmp_path):
        from financial_rag_tpu.llm.local_llm import LocalLLM
        from financial_rag_tpu.llm.provider import synthesize_answer
        llm = LocalLLM(model_dir=str(tmp_path / "nope"))
        assert not llm.available()
        ans = synthesize_answer(llm, "q", [{"content": "ctx"}])
        assert ans.startswith("LLM unavailable")


class TestInt8WeightOnly:
    def test_quantized_logits_close_and_greedy_stable(self):
        from financial_rag_tpu.models.decoder import quantize_decoder_params
        cfg = DecoderConfig(vocab_size=97, num_layers=2, hidden_size=32,
                            num_heads=4, num_kv_heads=2, intermediate_size=64,
                            attention_bias=True, eos_token_id=0)
        p = random_decoder_params(cfg, 0)
        pq = quantize_decoder_params(p)
        # matmul weights shrink to int8; norms/biases/embed untouched
        assert pq["layers"]["q_w"]["q"].dtype == jnp.int8
        assert pq["layers"]["ln1"].dtype == p["layers"]["ln1"].dtype
        assert pq["lm_head"]["q"].dtype == jnp.int8
        ids = jnp.asarray(np.random.default_rng(0).integers(1, 97, (2, 9)),
                          jnp.int32)
        lf = decoder_forward(p, ids, cfg)
        lq = decoder_forward(pq, ids, cfg)
        # per-channel symmetric int8: sub-1% of the logit scale
        assert float(jnp.max(jnp.abs(lf - lq))) < 0.01 * float(jnp.max(jnp.abs(lf)) + 1e-6) + 5e-3
        am = jnp.ones((2, 9), jnp.int32)
        tf = np.asarray(generate_tokens(p, ids, am, jax.random.PRNGKey(0),
                                        cfg=cfg, max_new_tokens=6))
        tq = np.asarray(generate_tokens(pq, ids, am, jax.random.PRNGKey(0),
                                        cfg=cfg, max_new_tokens=6))
        np.testing.assert_array_equal(tf, tq)

    def test_tied_embeddings_get_int8_head_copy(self):
        """Tied models keep the full-precision embed for the input gather but
        gain a SEPARATE int8 copy of the table for the logits matmul — the
        largest weight read of a decode step. Greedy tokens must not move."""
        from financial_rag_tpu.models.decoder import quantize_decoder_params
        cfg = DecoderConfig(vocab_size=64, num_layers=1, hidden_size=16,
                            num_heads=2, num_kv_heads=2, intermediate_size=32,
                            tie_embeddings=True, eos_token_id=0)
        p = random_decoder_params(cfg, 0)
        pq = quantize_decoder_params(p)
        assert pq["embed"].dtype != jnp.int8   # input gather: full precision
        assert pq["lm_head"]["q"].dtype == jnp.int8
        assert pq["lm_head"]["q"].shape == (64, 16)
        ids = jnp.asarray(np.random.default_rng(1).integers(1, 64, (2, 7)),
                          jnp.int32)
        am = jnp.ones((2, 7), jnp.int32)
        tf = np.asarray(generate_tokens(p, ids, am, jax.random.PRNGKey(0),
                                        cfg=cfg, max_new_tokens=6))
        tq = np.asarray(generate_tokens(pq, ids, am, jax.random.PRNGKey(0),
                                        cfg=cfg, max_new_tokens=6))
        np.testing.assert_array_equal(tf, tq)

    def test_fused_qkv_gateup_parity(self):
        """fuse_decoder_params is numerically EXACT: logits and greedy
        tokens match the split layout bit-for-bit in bf16 and int8 (the
        per-output-channel int8 scales are column-independent, so the
        concat of quantized blocks equals quantizing the concat)."""
        from financial_rag_tpu.models.decoder import (
            fuse_decoder_params, quantize_decoder_params)
        cfg = DecoderConfig(vocab_size=97, num_layers=2, hidden_size=32,
                            num_heads=4, num_kv_heads=2, intermediate_size=64,
                            attention_bias=True, tie_embeddings=True,
                            eos_token_id=0)
        p = random_decoder_params(cfg, 0)
        ids = jnp.asarray(np.random.default_rng(2).integers(1, 97, (2, 9)),
                          jnp.int32)
        am = jnp.ones((2, 9), jnp.int32).at[1, :2].set(0)
        for base in (p, quantize_decoder_params(p)):
            pf = fuse_decoder_params(base)
            assert "qkv_w" in pf["layers"] and "q_w" not in pf["layers"]
            np.testing.assert_allclose(   # fused matmuls may tile (and so
                np.asarray(decoder_forward(base, ids, cfg, am)),   # round)
                np.asarray(decoder_forward(pf, ids, cfg, am)),     # differently
                atol=1e-5, rtol=1e-4)
            ts = np.asarray(generate_tokens(base, ids, am,
                                            jax.random.PRNGKey(0), cfg=cfg,
                                            max_new_tokens=6))
            tf = np.asarray(generate_tokens(pf, ids, am,
                                            jax.random.PRNGKey(0), cfg=cfg,
                                            max_new_tokens=6))
            np.testing.assert_array_equal(ts, tf)

    def test_local_llm_int8_dtype(self, tmp_path):
        from financial_rag_tpu.llm.local_llm import LocalLLM
        model, cfg, _ = _tiny_qwen2()
        model.save_pretrained(str(tmp_path))
        from tokenizers import Tokenizer, models as tm, pre_tokenizers
        vocab = {f"w{i}": i for i in range(200)}
        vocab["<unk>"] = 200
        tok = Tokenizer(tm.WordLevel(vocab, unk_token="<unk>"))
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        tok.save(str(tmp_path / "tokenizer.json"))
        llm = LocalLLM(model_dir=str(tmp_path), dtype="int8")
        assert llm.available()
        assert llm._params["layers"]["qkv_w"]["q"].dtype == jnp.int8
        out = llm.generate("w3 w4 w5", max_tokens=8)
        assert out is None or isinstance(out, str)


class TestSpeculative:
    """Prompt-lookup speculative decoding: greedy-exact, fewer steps."""

    @staticmethod
    def _trim(row, eos):
        row = list(row)
        return row[:row.index(eos)] if eos in row else row

    def _assert_parity(self, params, cfg, ids, am, max_new, draft_k=4,
                       ngram=3):
        from financial_rag_tpu.models.decoder import generate_tokens_spec
        plain = np.asarray(generate_tokens(
            params, ids, am, jax.random.PRNGKey(0), cfg=cfg,
            max_new_tokens=max_new))[0]
        spec, steps = generate_tokens_spec(
            params, ids, am, cfg=cfg, max_new_tokens=max_new,
            draft_k=draft_k, ngram=ngram)
        spec = np.asarray(spec)[0]
        assert self._trim(spec, cfg.eos_token_id) == \
            self._trim(plain, cfg.eos_token_id)
        return int(steps)

    def test_matches_plain_greedy(self):
        cfg = DecoderConfig(vocab_size=131, num_layers=2, hidden_size=32,
                            num_heads=4, num_kv_heads=2, intermediate_size=64,
                            attention_bias=True, eos_token_id=0)
        params = random_decoder_params(cfg, seed=7)
        for seed, plen in ((5, 6), (6, 11), (8, 17)):
            ids = np.random.default_rng(seed).integers(1, 131, (1, plen))
            self._assert_parity(params, cfg,
                                jnp.asarray(ids, jnp.int32),
                                jnp.ones((1, plen), jnp.int32), 24)

    def test_matches_with_left_padding(self):
        cfg = DecoderConfig(vocab_size=97, num_layers=2, hidden_size=32,
                            num_heads=4, num_kv_heads=2, intermediate_size=64,
                            attention_bias=True, tie_embeddings=True,
                            eos_token_id=0)
        params = random_decoder_params(cfg, seed=3)
        ids = np.random.default_rng(9).integers(1, 97, (1, 12))
        am = np.ones((1, 12), np.int32)
        ids[0, :5] = 0
        am[0, :5] = 0
        self._assert_parity(params, cfg, jnp.asarray(ids, jnp.int32),
                            jnp.asarray(am, jnp.int32), 20)

    def test_matches_eos_trim_semantics(self):
        """Spec output trimmed at eos equals plain trimmed output even when
        eos lands mid-block."""
        cfg = DecoderConfig(vocab_size=29, num_layers=1, hidden_size=16,
                            num_heads=2, num_kv_heads=2, intermediate_size=32,
                            eos_token_id=11)
        params = random_decoder_params(cfg, seed=0)
        ids = jnp.asarray([[1, 2, 3]], jnp.int32)
        self._assert_parity(params, cfg, ids, jnp.ones((1, 3), jnp.int32),
                            12, draft_k=5)

    def test_repetitive_model_accepts_drafts(self):
        """A model that settles into a cycle gives prompt-lookup high
        acceptance: steps must come in well under tokens emitted. (Both
        paths produce identical tokens regardless — this pins the SPEEDUP
        mechanism, not just correctness.)"""
        from financial_rag_tpu.models.decoder import generate_tokens_spec
        cfg = DecoderConfig(vocab_size=29, num_layers=1, hidden_size=16,
                            num_heads=2, num_kv_heads=2, intermediate_size=32,
                            eos_token_id=0)
        params = random_decoder_params(cfg, seed=1)
        ids = jnp.asarray([[5, 9, 4, 7]], jnp.int32)
        am = jnp.ones((1, 4), jnp.int32)
        max_new = 48
        plain = np.asarray(generate_tokens(
            params, ids, am, jax.random.PRNGKey(0), cfg=cfg,
            max_new_tokens=max_new))[0]
        if len(set(self._trim(plain, 0))) >= len(self._trim(plain, 0)) - 2:
            import pytest
            pytest.skip("this seed's greedy rollout never repeats")
        steps = self._assert_parity(params, cfg, ids, am, max_new,
                                    draft_k=6)
        emitted = len(self._trim(plain, 0)) or max_new
        assert steps < emitted, (steps, emitted)

    def test_int8_fused_spec_matches_their_plain(self):
        """Speculation composes with the serving layout (int8 + fused)."""
        from financial_rag_tpu.models.decoder import (
            fuse_decoder_params, quantize_decoder_params)
        cfg = DecoderConfig(vocab_size=97, num_layers=2, hidden_size=32,
                            num_heads=4, num_kv_heads=2, intermediate_size=64,
                            attention_bias=True, tie_embeddings=True,
                            eos_token_id=0)
        p = fuse_decoder_params(quantize_decoder_params(
            random_decoder_params(cfg, seed=0)))
        ids = np.random.default_rng(2).integers(1, 97, (1, 9))
        self._assert_parity(p, cfg, jnp.asarray(ids, jnp.int32),
                            jnp.ones((1, 9), jnp.int32), 16)

    def test_stream_spec_concat_equals_one_shot(self):
        """Speculative streaming blocks concatenate to the plain greedy
        one-shot output (trimmed at eos), across segment boundaries."""
        from financial_rag_tpu.models.decoder import generate_stream_spec
        cfg = DecoderConfig(vocab_size=131, num_layers=2, hidden_size=32,
                            num_heads=4, num_kv_heads=2, intermediate_size=64,
                            attention_bias=True, eos_token_id=0)
        params = random_decoder_params(cfg, seed=7)
        ids = np.random.default_rng(5).integers(1, 131, (1, 6))
        idsj = jnp.asarray(ids, jnp.int32)
        am = jnp.ones((1, 6), jnp.int32)
        plain = np.asarray(generate_tokens(
            params, idsj, am, jax.random.PRNGKey(0), cfg=cfg,
            max_new_tokens=30))[0]
        for seg in (5, 11, 30):
            got = np.concatenate([b[0] for b in generate_stream_spec(
                params, idsj, am, cfg=cfg, max_new_tokens=30,
                segment=seg, draft_k=4)])
            assert self._trim(got, 0) == self._trim(plain, 0), seg

    def test_stream_spec_eos_mid_segment(self):
        cfg = DecoderConfig(vocab_size=29, num_layers=1, hidden_size=16,
                            num_heads=2, num_kv_heads=2, intermediate_size=32,
                            eos_token_id=11)
        params = random_decoder_params(cfg, seed=0)
        from financial_rag_tpu.models.decoder import generate_stream_spec
        ids = jnp.asarray([[1, 2, 3]], jnp.int32)
        am = jnp.ones((1, 3), jnp.int32)
        plain = np.asarray(generate_tokens(
            params, ids, am, jax.random.PRNGKey(0), cfg=cfg,
            max_new_tokens=16))[0]
        got = np.concatenate([b[0] for b in generate_stream_spec(
            params, ids, am, cfg=cfg, max_new_tokens=16, segment=6,
            draft_k=5)])
        assert self._trim(got, 11) == self._trim(plain, 11)

    def test_local_llm_spec_matches_plain(self, tmp_path):
        """LocalLLM with LLM_SPEC_K on and off returns the same text.

        float32 so the comparison is deterministic: under bf16 a near-tie
        (top-2 logit gap ~1 ulp) may resolve differently between the
        block-verified and one-token computations — both are valid greedy
        rollouts (verified against the no-cache forward when it happened);
        the f32 tests above pin the speculation bookkeeping exactly."""
        from financial_rag_tpu.llm.local_llm import LocalLLM
        model, cfg, _ = _tiny_qwen2()
        d = tmp_path / "m"
        model.save_pretrained(str(d))
        from tokenizers import Tokenizer, models as tok_models, pre_tokenizers
        vocab = {f"tok{i}": i for i in range(cfg.vocab_size)}
        tok = Tokenizer(tok_models.WordLevel(vocab, unk_token="tok0"))
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        tok.save(str(d / "tokenizer.json"))
        llm_spec = LocalLLM(model_dir=str(d), dtype="float32")
        llm_plain = LocalLLM(model_dir=str(d), dtype="float32")
        llm_plain.cfg = type(llm_plain.cfg)(**{
            **llm_plain.cfg.__dict__, "local_spec_k": 0})
        a = llm_spec.generate("tok5 tok9 tok4", max_tokens=24)
        b = llm_plain.generate("tok5 tok9 tok4", max_tokens=24)
        assert a == b and a


class TestGenerateStream:
    def test_stream_equals_one_shot_greedy_and_sampled(self):
        from financial_rag_tpu.models.decoder import generate_stream
        cfg = DecoderConfig(vocab_size=97, num_layers=2, hidden_size=32,
                            num_heads=4, num_kv_heads=2, intermediate_size=64,
                            attention_bias=True, eos_token_id=0)
        p = random_decoder_params(cfg, 0)
        ids = jnp.asarray(np.random.default_rng(0).integers(1, 97, (2, 9)),
                          jnp.int32)
        am = jnp.ones((2, 9), jnp.int32).at[0, :3].set(0)
        one = np.asarray(generate_tokens(p, ids, am, jax.random.PRNGKey(0),
                                         cfg=cfg, max_new_tokens=12))
        blocks = list(generate_stream(p, ids, am, jax.random.PRNGKey(0),
                                      cfg=cfg, max_new_tokens=12, segment=5))
        np.testing.assert_array_equal(np.concatenate(blocks, 1), one)
        # sampled path: identical when the rng stream lines up (segment
        # dividing max_new keeps split() counts equal)
        one_s = np.asarray(generate_tokens(
            p, ids, am, jax.random.PRNGKey(3), cfg=cfg, max_new_tokens=12,
            temperature=0.9, top_k=8))
        blocks = list(generate_stream(
            p, ids, am, jax.random.PRNGKey(3), cfg=cfg, max_new_tokens=12,
            segment=4, temperature=0.9, top_k=8))
        np.testing.assert_array_equal(np.concatenate(blocks, 1), one_s)

    def test_stream_stops_early_on_all_eos(self):
        from financial_rag_tpu.models.decoder import generate_stream
        cfg = DecoderConfig(vocab_size=29, num_layers=1, hidden_size=16,
                            num_heads=2, num_kv_heads=2, intermediate_size=32,
                            eos_token_id=11)
        p = random_decoder_params(cfg, 0)
        ids = jnp.asarray([[1, 2, 3]], jnp.int32)
        am = jnp.ones((1, 3), jnp.int32)
        one = np.asarray(generate_tokens(p, ids, am, jax.random.PRNGKey(1),
                                         cfg=cfg, max_new_tokens=40))[0]
        blocks = list(generate_stream(p, ids, am, jax.random.PRNGKey(1),
                                      cfg=cfg, max_new_tokens=40, segment=8))
        got = np.concatenate(blocks, 1)[0]

        def trim(t):
            t = list(t)
            return t[:t.index(11)] if 11 in t else t

        assert trim(got) == trim(one)
        if 11 in list(one[: len(got) - 8]):     # eos well before the end
            assert got.shape[0] < 40, "stream should stop early after eos"

    def test_local_llm_generate_stream_concat_equals_generate(self, tmp_path):
        from financial_rag_tpu.llm.local_llm import LocalLLM
        model, cfg, _ = _tiny_qwen2()
        model.save_pretrained(str(tmp_path))
        from tokenizers import Tokenizer, models as tm, pre_tokenizers
        vocab = {f"w{i}": i for i in range(200)}
        vocab["<unk>"] = 200
        tok = Tokenizer(tm.WordLevel(vocab, unk_token="<unk>"))
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        tok.save(str(tmp_path / "tokenizer.json"))
        llm = LocalLLM(model_dir=str(tmp_path), dtype="float32")
        full = llm.generate("w1 w2 w3", max_tokens=16)
        streamed = "".join(llm.generate_stream("w1 w2 w3", max_tokens=16,
                                               segment=5))
        assert streamed.strip() == (full or "")


class TestBatchedGeneration:
    @pytest.fixture(scope="class")
    def llm(self, tmp_path_factory):
        from financial_rag_tpu.llm.local_llm import LocalLLM
        d = tmp_path_factory.mktemp("batch_llm")
        model, cfg, _ = _tiny_qwen2()
        model.save_pretrained(str(d))
        from tokenizers import Tokenizer, models as tm, pre_tokenizers
        vocab = {f"w{i}": i for i in range(200)}
        vocab["<unk>"] = 200
        tok = Tokenizer(tm.WordLevel(vocab, unk_token="<unk>"))
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        tok.save(str(d / "tokenizer.json"))
        return LocalLLM(model_dir=str(d), dtype="float32")

    def test_generate_many_matches_solo(self, llm):
        prompts = ["w1 w2 w3", "w9 w8 w7 w6 w5 w4", "w100"]
        solo = [llm.generate(p, max_tokens=12) for p in prompts]
        many = llm.generate_many(prompts, max_tokens=12)
        assert many == solo   # left-pad invariance: batching can't change tokens

    def test_generate_many_empty(self, llm):
        assert llm.generate_many([]) == []

    def test_warm_compiles_serving_programs(self, llm):
        # compiles the streaming + one-shot answer programs; idempotent
        assert llm.warm() is True
        assert llm.warm() is True

    def test_batching_llm_coalesces(self, llm):
        import threading
        from financial_rag_tpu.serving.batcher import BatchingLLM
        wrapped = BatchingLLM(llm, max_items=8)
        _ = wrapped.generate("w1 w2", max_tokens=8)   # warm compile
        solo = {p: llm.generate(p, max_tokens=8) for p in
                ["w1 w2", "w3 w4", "w5 w6 w7"]}
        results = {}
        barrier = threading.Barrier(3)

        def worker(p):
            barrier.wait()
            results[p] = wrapped.generate(p, max_tokens=8)

        ts = [threading.Thread(target=worker, args=(p,)) for p in solo]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert results == solo            # batched == per-request output
        st = wrapped.stats()
        assert st["submitted"] >= 3
        wrapped.batcher.close()

    def test_stream_passthrough_on_wrapper(self, llm):
        from financial_rag_tpu.serving.batcher import BatchingLLM
        wrapped = BatchingLLM(llm, max_items=8)
        full = llm.generate("w2 w4", max_tokens=8) or ""
        streamed = "".join(wrapped.generate_stream("w2 w4", max_tokens=8))
        assert streamed.strip() == full
        wrapped.batcher.close()

    def test_generate_many_per_row_caps(self, llm):
        # a wave decodes to the LARGEST cap's bucket, but each row keeps its
        # OWN max_tokens contract
        prompts = ["w1 w2 w3", "w9 w8 w7"]
        solo = [llm.generate(prompts[0], max_tokens=2),
                llm.generate(prompts[1], max_tokens=12)]
        many = llm.generate_many(prompts, max_tokens=[2, 12])
        assert many == solo

    def test_batching_llm_respects_per_request_cap(self, llm):
        import threading
        from financial_rag_tpu.serving.batcher import BatchingLLM
        wrapped = BatchingLLM(llm, max_items=8)   # direct=0: always coalesce
        want = {("w1 w2", 2): llm.generate("w1 w2", max_tokens=2),
                ("w3 w4", 12): llm.generate("w3 w4", max_tokens=12)}
        got = {}
        barrier = threading.Barrier(2)

        def worker(p, mt):
            barrier.wait()
            got[(p, mt)] = wrapped.generate(p, max_tokens=mt)

        ts = [threading.Thread(target=worker, args=k) for k in want]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert got == want
        wrapped.batcher.close()

    def test_batching_llm_direct_lane_uses_inner_generate(self, llm):
        from financial_rag_tpu.serving.batcher import BatchingLLM
        wrapped = BatchingLLM(llm, max_items=8, direct=2)
        out = wrapped.generate("w5 w6", max_tokens=8)
        assert out == llm.generate("w5 w6", max_tokens=8)
        st = wrapped.stats()
        # an idle request must take the inner provider's own (speculative)
        # batch-1 path, not the batched plain-greedy decode
        assert st["direct"] == 1 and st["calls"] == 0
        wrapped.batcher.close()

    def test_stream_holds_back_split_multibyte_chars(self, llm, monkeypatch):
        # byte-level BPE decodes an INCOMPLETE multi-byte char (split across
        # two segments) as U+FFFD, then REWRITES it once the next segment
        # completes it — the delta stream must hold such chars back so
        # ''.join(deltas) (the stored answer) equals the final decode
        import financial_rag_tpu.models.decoder as dec
        eos = llm._dcfg.eos_token_id

        class _ByteishTok:
            class _Enc:
                ids = [3]

            def encode(self, text):
                return self._Enc()

            def decode(self, toks, skip_special_tokens=True):
                out, i = [], 0
                while i < len(toks):
                    if toks[i] == 7:              # first half of a 2-token char
                        if i + 1 < len(toks):
                            out.append("é")
                            i += 2
                        else:
                            out.append("�")  # incomplete at the border
                            i += 1
                    else:
                        out.append(f"w{toks[i]} ")
                        i += 1
                return "".join(out)

        blocks = [np.array([[3, 7]]), np.array([[4, eos]])]
        monkeypatch.setattr(dec, "generate_stream",
                            lambda *a, **k: iter(blocks))
        monkeypatch.setattr(dec, "generate_stream_spec",
                            lambda *a, **k: iter(blocks))
        monkeypatch.setattr(llm, "_tok", _ByteishTok())
        deltas = list(llm.generate_stream("anything", max_tokens=16))
        assert deltas == ["w3 ", "é"]
        assert "�" not in "".join(deltas)
