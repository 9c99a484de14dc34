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
        spec_k = max(0, int(self.cfg.local_spec_k))
        if spec_k:
            # batch-1 greedy: prompt-lookup speculation emits greedy-
            # equivalent tokens in fewer (weight-stream-bound) steps —
            # RAG answers quote the context, so drafted spans verify often
            toks, _steps = generate_tokens_spec(
                self._params, jnp.asarray(input_ids), jnp.asarray(mask),
                cfg=self._dcfg, max_new_tokens=max_new, draft_k=spec_k)
        else:
            toks = generate_tokens(
                self._params, jnp.asarray(input_ids), jnp.asarray(mask),
                jax.random.PRNGKey(0), cfg=self._dcfg,
                max_new_tokens=max_new, temperature=0.0)
        # the device generates a full bucket; the CONTRACT is max_tokens
        out = np.asarray(toks)[0].tolist()[:max_tokens]
        if self._dcfg.eos_token_id in out:
            out = out[:out.index(self._dcfg.eos_token_id)]
        text = self._clean(self._tok.decode(out, skip_special_tokens=True)).strip()
        return text or None

    def generate_many(self, prompts, *, max_tokens: int = 1024):
        """Batched generation: one device dispatch answers every prompt.

        At the 0.5B shape a decode step costs 3.0 ms for EIGHT rows vs
        1.8 ms for one (weights amortize across the batch, BENCH_LLM.json),
        so coalescing concurrent requests nearly 5x-es answer throughput.
        Prompts LEFT-pad to the largest bucket in the wave; the batch pads
        to a power of two (compile-bounded). Returns one Optional[str] per
        prompt, in order.
        """
        if not prompts:
            return []
        if not self._ensure_loaded():
            return [None] * len(prompts)
        import jax
        import jax.numpy as jnp

        from financial_rag_tpu.models.decoder import generate_tokens

        max_tokens = min(max_tokens, self.cfg.local_max_new_tokens)
        max_new = _bucket(max(1, max_tokens), _NEW_TOKEN_BUCKETS)
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
            temperature=0.0))
        out = []
        for i in range(len(rows)):
            row = toks[i].tolist()[:max_tokens]   # bucket -> requested cap
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
        spec_k = max(0, int(self.cfg.local_spec_k))
        if spec_k:
            stream = generate_stream_spec(
                self._params, jnp.asarray(input_ids), jnp.asarray(mask),
                cfg=self._dcfg, max_new_tokens=max_new, segment=segment,
                draft_k=spec_k)
        else:
            stream = generate_stream(
                self._params, jnp.asarray(input_ids), jnp.asarray(mask),
                jax.random.PRNGKey(0), cfg=self._dcfg,
                max_new_tokens=max_new, segment=segment, temperature=0.0)
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
            if len(text) > len(emitted):
                yield text[len(emitted):]
                emitted = text
            if stop or len(toks) >= max_tokens or text != raw:
                return   # eos, cap reached, or a stop marker ended the turn
