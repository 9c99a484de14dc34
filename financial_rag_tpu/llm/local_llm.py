"""On-device LLM provider: answer synthesis from a local HF checkpoint.

The reference can only synthesize answers through an external HTTP API
(reference api_adapter.py:18-56); without a key/network every answer
degrades to concatenated context. This provider runs a Qwen2/Llama-family
checkpoint on the TPU itself (models/decoder.py), so the full RAG loop —
retrieve, rerank, SYNTHESIZE — works with zero egress.

Point LLM_CHECKPOINT at a HuggingFace model directory (config.json +
model.safetensors [+ index shards] + tokenizer.json) and set
LLM_PROVIDER=local. Prompts are LEFT-padded to static length buckets and
generation length is bucketed too, so the whole generate call compiles
once per (bucket, max_new) pair and each request is ONE device dispatch.
"""

from __future__ import annotations

import json
import threading
from pathlib import Path
from typing import Optional

import numpy as np

from financial_rag_tpu.config import LLMConfig
from financial_rag_tpu.utils import get_logger

log = get_logger("llm.local")

# the full answer prompt (5 parents x 3000 chars, llm/prompts.py) runs
# ~4-5k tokens, so the top bucket must hold it: truncating to 2048 would
# silently drop the earliest retrieved context. KV cache at 4096+256 slots
# is ~54 MB at the 0.5B shape — noise next to the weights.
_PROMPT_BUCKETS = (128, 256, 512, 1024, 2048, 4096)
_NEW_TOKEN_BUCKETS = (64, 256, 1024)


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _load_state_dict(model_dir: Path) -> dict:
    """model.safetensors, sharded *.safetensors via index, or pytorch_model.bin."""
    from safetensors import safe_open

    def read(path: Path, out: dict) -> None:
        with safe_open(str(path), framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)

    sd: dict = {}
    single = model_dir / "model.safetensors"
    index = model_dir / "model.safetensors.index.json"
    if single.exists():
        read(single, sd)
    elif index.exists():
        shards = sorted(set(json.loads(index.read_text())["weight_map"].values()))
        for name in shards:
            read(model_dir / name, sd)
    else:
        import torch
        bin_path = model_dir / "pytorch_model.bin"
        state = torch.load(str(bin_path), map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in state.items()}
    return sd


class LocalLLM:
    """LLMProvider backed by models/decoder.py. Thread-safe; loads lazily."""

    name = "local"

    def __init__(self, cfg: Optional[LLMConfig] = None,
                 model_dir: Optional[str] = None, dtype: Optional[str] = None,
                 max_prompt_tokens: int = 4096) -> None:
        self.cfg = cfg or LLMConfig()
        self.model_dir = Path(model_dir or self.cfg.local_checkpoint or "")
        # "bfloat16" (default) | "int8" (weight-only) | "float32"
        self.dtype = dtype or self.cfg.local_dtype
        self.max_prompt_tokens = max_prompt_tokens
        self._lock = threading.Lock()
        self._loaded = False
        self._failed = False
        self._params = None
        self._dcfg = None
        self._tok = None
        self._chat: Optional[str] = None     # "chatml" | "inst" | None
        self._engine = None                  # lazy ContinuousDecodeEngine

    # ----------------------------------------------------------------- load

    def _ensure_loaded(self) -> bool:
        if self._loaded:
            return True
        if self._failed:
            return False
        with self._lock:
            if self._loaded or self._failed:
                return self._loaded
            try:
                self._load()
                self._loaded = True
            except Exception as e:  # noqa: BLE001 — degrade, don't crash serving
                log.warning("local LLM unavailable (%s): %s", self.model_dir, e)
                self._failed = True
        return self._loaded

    def _load(self) -> None:
        import jax.numpy as jnp

        from financial_rag_tpu.models.decoder import (
            DecoderConfig, decoder_params_from_torch_state_dict)

        hf_cfg = json.loads((self.model_dir / "config.json").read_text())
        self._dcfg = DecoderConfig.from_hf_config(hf_cfg)
        sd = _load_state_dict(self.model_dir)
        dtype = jnp.float32 if self.dtype == "float32" else jnp.bfloat16
        self._params = decoder_params_from_torch_state_dict(
            sd, self._dcfg, dtype=dtype)
        if self.dtype == "int8":   # weight-only quant: ~2x decode bandwidth
            from financial_rag_tpu.models.decoder import quantize_decoder_params
            self._params = quantize_decoder_params(self._params)
        # single-device serving: fuse q/k/v and gate/up into one matmul each
        # (exact; tensor-parallel callers shard the UNfused layout instead)
        from financial_rag_tpu.models.decoder import fuse_decoder_params
        self._params = fuse_decoder_params(self._params)

        from tokenizers import Tokenizer
        self._tok = Tokenizer.from_file(str(self.model_dir / "tokenizer.json"))

        # chat-template detection: enough to cover the two template families
        # these architectures ship with; anything else runs as completion.
        tcfg_path = self.model_dir / "tokenizer_config.json"
        template = ""
        if tcfg_path.exists():
            template = json.loads(tcfg_path.read_text()).get("chat_template") or ""
        if "im_start" in template:
            self._chat = "chatml"
        elif "[INST]" in template:
            self._chat = "inst"
        log.info("local LLM loaded: %s (%d layers, %d hidden, template=%s)",
                 self.model_dir.name, self._dcfg.num_layers,
                 self._dcfg.hidden_size, self._chat or "completion")

    # ------------------------------------------------------------- provider

    def available(self) -> bool:
        return self._ensure_loaded()

    def _wrap(self, prompt: str) -> str:
        if self._chat == "chatml":
            return (f"<|im_start|>user\n{prompt}<|im_end|>\n"
                    f"<|im_start|>assistant\n")
        if self._chat == "inst":
            return f"[INST] {prompt} [/INST]"
        return prompt

    def _prep(self, prompt: str):
        """Tokenize + LEFT-pad to a static bucket -> (ids, mask) arrays."""
        enc = self._tok.encode(self._wrap(prompt))
        ids = list(enc.ids)[-self.max_prompt_tokens:]
        bucket = _bucket(len(ids), _PROMPT_BUCKETS)
        pad = bucket - len(ids)
        input_ids = np.full((1, bucket), self._dcfg.eos_token_id, np.int32)
        mask = np.zeros((1, bucket), np.int32)
        input_ids[0, pad:] = ids                    # LEFT padding
        mask[0, pad:] = 1
        return input_ids, mask

    @staticmethod
    def _clean(text: str) -> str:
        # a chat turn ends at the template's end marker even if the model
        # keeps going (no eos in the first max_new tokens)
        for stop in ("<|im_end|>", "</s>", "[INST]"):
            if stop in text:
                text = text.split(stop, 1)[0]
        return text

    def warm(self) -> bool:
        """Precompile the serving answer programs at the shapes real
        requests hit: the segmented stream (prefill + first segment, then
        the steady-state segment program) and the one-shot generate, on a
        synthetic 5-parent answer prompt (the bucket serving prompts land
        in). Returns True when the provider is live. Device time is one
        short generation; the point is the tens of seconds of compile the
        FIRST user request would otherwise stall on."""
        if not self._ensure_loaded():
            return False
        from financial_rag_tpu.llm.prompts import build_answer_prompt
        filler = ("amount due rent invoice total period lease tax schedule "
                  * 60)[:3000]
        prompt = build_answer_prompt(
            "what is the total amount due for the period?",
            [{"content": filler, "title": f"warm {i}"} for i in range(5)])
        gen = self.generate_stream(prompt)
        next(gen, None)
        next(gen, None)   # 2nd block compiles the steady-state segment step
        gen.close()
        self.generate(prompt)   # default caps == serving caps: same bucket
        return True

    def _prefill_impl(self, bucket: int) -> str:
        """Causal flash prefill (ops/causal_flash.py) for the long serving
        buckets on TPU; XLA elsewhere (resolve_prefill_impl gates)."""
        from financial_rag_tpu.models.decoder import resolve_prefill_impl
        return resolve_prefill_impl(
            self._dcfg, bucket,
            dtype_bytes=4 if self.dtype == "float32" else 2)

    def generate(self, prompt: str, *, max_tokens: int = 1024) -> Optional[str]:
        if not self._ensure_loaded():
            return None
        import jax
        import jax.numpy as jnp

        from financial_rag_tpu.models.decoder import (
            generate_tokens, generate_tokens_spec)

        input_ids, mask = self._prep(prompt)
        max_tokens = min(max_tokens, self.cfg.local_max_new_tokens)
        max_new = _bucket(max(1, max_tokens), _NEW_TOKEN_BUCKETS)
        pimpl = self._prefill_impl(input_ids.shape[1])
        spec_k = max(0, int(self.cfg.local_spec_k))
        if spec_k:
            # batch-1 greedy: prompt-lookup speculation emits greedy-
            # equivalent tokens in fewer (weight-stream-bound) steps —
            # RAG answers quote the context, so drafted spans verify often
            toks, _steps = generate_tokens_spec(
                self._params, jnp.asarray(input_ids), jnp.asarray(mask),
                cfg=self._dcfg, max_new_tokens=max_new, draft_k=spec_k,
                prefill_impl=pimpl)
        else:
            toks = generate_tokens(
                self._params, jnp.asarray(input_ids), jnp.asarray(mask),
                jax.random.PRNGKey(0), cfg=self._dcfg,
                max_new_tokens=max_new, temperature=0.0,
                prefill_impl=pimpl)
        # the device generates a full bucket; the CONTRACT is max_tokens
        out = np.asarray(toks)[0].tolist()[:max_tokens]
        if self._dcfg.eos_token_id in out:
            out = out[:out.index(self._dcfg.eos_token_id)]
        text = self._clean(self._tok.decode(out, skip_special_tokens=True)).strip()
        return text or None

    def generate_many(self, prompts, *, max_tokens=1024):
        """Batched generation: one device dispatch answers every prompt.

        At the 0.5B shape a decode step costs 3.0 ms for EIGHT rows vs
        1.8 ms for one (weights amortize across the batch, BENCH_LLM.json),
        so coalescing concurrent requests nearly 5x-es answer throughput.
        Prompts LEFT-pad to the largest bucket in the wave; the batch pads
        to a power of two (compile-bounded). Returns one Optional[str] per
        prompt, in order.

        ``max_tokens`` may be one int for the whole wave or a per-prompt
        sequence: the device decodes to the LARGEST cap's bucket, but each
        row is trimmed to its OWN cap — coalescing must not relax any
        individual request's contract.
        """
        if not prompts:
            return []
        if not self._ensure_loaded():
            return [None] * len(prompts)
        import jax
        import jax.numpy as jnp

        from financial_rag_tpu.models.decoder import generate_tokens

        if isinstance(max_tokens, (list, tuple)):
            assert len(max_tokens) == len(prompts)
            caps = [max(1, min(int(m), self.cfg.local_max_new_tokens))
                    for m in max_tokens]
        else:
            caps = [max(1, min(int(max_tokens),
                               self.cfg.local_max_new_tokens))] * len(prompts)
        max_new = _bucket(max(caps), _NEW_TOKEN_BUCKETS)
        rows = [self._prep(p) for p in prompts]
        bucket = max(r[0].shape[1] for r in rows)
        b = _bucket(len(rows), (1, 2, 4, 8, 16, 32))
        input_ids = np.full((b, bucket), self._dcfg.eos_token_id, np.int32)
        mask = np.zeros((b, bucket), np.int32)
        for i, (ids, m) in enumerate(rows):
            w = ids.shape[1]
            input_ids[i, bucket - w:] = ids[0]    # re-left-pad to the wave
            mask[i, bucket - w:] = m[0]           # bucket (pads stay masked)
        toks = np.asarray(generate_tokens(
            self._params, jnp.asarray(input_ids), jnp.asarray(mask),
            jax.random.PRNGKey(0), cfg=self._dcfg, max_new_tokens=max_new,
            temperature=0.0, prefill_impl=self._prefill_impl(bucket)))
        out = []
        for i in range(len(rows)):
            row = toks[i].tolist()[:caps[i]]      # bucket -> THIS row's cap
            if self._dcfg.eos_token_id in row:
                row = row[:row.index(self._dcfg.eos_token_id)]
            text = self._clean(
                self._tok.decode(row, skip_special_tokens=True)).strip()
            out.append(text or None)
        return out

    def generate_stream(self, prompt: str, *, max_tokens: int = 1024,
                        segment: int = 48):
        """Yield text deltas. Token stream is identical to generate()'s
        (greedy, same rng scheme); each segment is one device dispatch, so
        the first words appear after prefill + one segment instead of the
        whole generation."""
        if not self._ensure_loaded():
            return
        import jax
        import jax.numpy as jnp

        from financial_rag_tpu.models.decoder import (
            generate_stream, generate_stream_spec)

        input_ids, mask = self._prep(prompt)
        max_tokens = min(max_tokens, self.cfg.local_max_new_tokens)
        max_new = _bucket(max(1, max_tokens), _NEW_TOKEN_BUCKETS)
        pimpl = self._prefill_impl(input_ids.shape[1])
        spec_k = max(0, int(self.cfg.local_spec_k))
        if spec_k:
            stream = generate_stream_spec(
                self._params, jnp.asarray(input_ids), jnp.asarray(mask),
                cfg=self._dcfg, max_new_tokens=max_new, segment=segment,
                draft_k=spec_k, prefill_impl=pimpl)
        else:
            stream = generate_stream(
                self._params, jnp.asarray(input_ids), jnp.asarray(mask),
                jax.random.PRNGKey(0), cfg=self._dcfg,
                max_new_tokens=max_new, segment=segment, temperature=0.0,
                prefill_impl=pimpl)
        yield from self._blocks_to_deltas(stream, max_tokens)

    def _blocks_to_deltas(self, stream, max_tokens: int):
        """Token blocks [1, n] -> text deltas (shared by the per-request
        stream and the continuous engine path)."""
        toks: list = []
        emitted = ""
        for block in stream:
            # bucket -> requested cap: emit at most max_tokens in total
            row = block[0].tolist()[:max(0, max_tokens - len(toks))]
            stop = self._dcfg.eos_token_id in row
            if stop:
                row = row[:row.index(self._dcfg.eos_token_id)]
            toks.extend(row)
            # re-decode the full prefix: BPE merges can span block borders
            raw = self._tok.decode(toks, skip_special_tokens=True)
            text = self._clean(raw)
            done = stop or len(toks) >= max_tokens or text != raw
            # HOLD BACK trailing U+FFFD: a multi-byte UTF-8 sequence split
            # across a segment border decodes to replacement chars that the
            # NEXT block's re-decode rewrites — emitting them would break
            # the emitted-is-a-prefix invariant the deltas rely on (SSE
            # consumers append; ''.join(deltas) is the stored answer)
            stable = text if done else text.rstrip("�")
            if stable.startswith(emitted):
                if len(stable) > len(emitted):
                    yield stable[len(emitted):]
                    emitted = stable
            elif done:
                # non-prefix-monotone decode (shouldn't happen with the
                # holdback; guards exotic tokenizers). Already-sent deltas
                # can't be retracted — fail the stream so the caller's
                # degradation path regenerates a consistent answer.
                raise RuntimeError(
                    "stream decode diverged from emitted prefix")
            if done:
                return   # eos, cap reached, or a stop marker ended the turn
        # an ended block stream (the engine stops AT eos without emitting
        # it) already yielded every stable delta; nothing to flush

    # ------------------------------------------------- continuous batching

    def _get_engine(self):
        """Lazy shared ContinuousDecodeEngine (llm/continuous.py)."""
        with self._lock:
            if self._engine is None:
                from financial_rag_tpu.llm.continuous import (
                    ContinuousDecodeEngine)
                self._engine = ContinuousDecodeEngine(
                    self._params, self._dcfg,
                    rows=max(1, int(self.cfg.local_continuous_rows)),
                    t_prompt=_bucket(self.max_prompt_tokens, _PROMPT_BUCKETS),
                    window=max(64, int(self.cfg.local_continuous_window)),
                    spec_k=max(0, int(getattr(
                        self.cfg, "local_continuous_spec_k", 0))),
                    prefill_impl_fn=self._prefill_impl)
            return self._engine

    def stream_via_engine(self, prompt: str, *, max_tokens: int = 1024):
        """Join the shared continuous-batching decode; yield text deltas.

        Returns None when the engine is disabled or cannot admit the
        request (window exhausted) — the caller falls back to the
        per-request `generate_stream`, so routing here never loses a
        request. Token stream is the same greedy sequence as
        `generate_stream`'s (exactly so in f32; see llm/continuous.py on
        bf16 near-ties)."""
        if int(self.cfg.local_continuous_rows) <= 0 or not self._ensure_loaded():
            return None
        input_ids, mask = self._prep(prompt)
        max_tokens = min(max_tokens, self.cfg.local_max_new_tokens)
        it = self._get_engine().submit(input_ids, mask, max(1, max_tokens))
        if it is None:
            return None
        return self._blocks_to_deltas(it, max_tokens)
