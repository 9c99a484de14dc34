"""TPU-native causal decoder LM (Qwen2/Llama-family) for answer synthesis.

The reference's answer synthesis is an HTTP call to an external LLM
(reference api_adapter.py:18-56, rag_backend.py:554-557) — unusable without
egress and never on the user's own hardware. This module serves the same
role on-device: a functional JAX decoder in the HF Qwen2/Llama architecture
(RMSNorm, rotary embeddings, grouped-query attention, SwiGLU) whose weights
load straight from a HuggingFace checkpoint directory.

TPU-first design notes:
- layers are STACKED on a leading axis and executed with ``lax.scan`` (one
  compiled layer body regardless of depth — same pattern as models/bert.py);
- generation is ONE jitted call: prefill fills the KV cache, then a
  ``lax.scan`` over decode steps emits every token. Through a tunneled
  device (~35 ms/RPC here) a per-token host loop would cost more in RPCs
  than in FLOPs; one dispatch + one materialization makes generation
  latency compute-bound;
- static shapes everywhere: the prompt is padded to a static bucket and
  ``max_new_tokens`` is a static scan length, so each (bucket, max_new)
  pair compiles once and is cached;
- params default to bf16 (MXU-native); softmax/RMSNorm accumulate in f32.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from financial_rag_tpu.utils import get_logger

log = get_logger("models.decoder")


@dataclass(frozen=True)
class DecoderConfig:
    """Architecture hyperparameters (HF config.json field names in parens)."""

    vocab_size: int = 32000            # vocab_size
    num_layers: int = 4                # num_hidden_layers
    hidden_size: int = 256             # hidden_size
    num_heads: int = 8                 # num_attention_heads
    num_kv_heads: int = 8              # num_key_value_heads (GQA when < heads)
    intermediate_size: int = 1024      # intermediate_size
    rope_theta: float = 10000.0        # rope_theta (Qwen2 ships 1e6)
    norm_eps: float = 1e-6             # rms_norm_eps
    attention_bias: bool = False       # q/k/v biases (True for Qwen2)
    tie_embeddings: bool = False       # tie_word_embeddings
    eos_token_id: int = 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def from_hf_config(cls, hf: Mapping[str, Any]) -> "DecoderConfig":
        """Build from a HuggingFace config.json dict (Qwen2 or Llama)."""
        arch = (hf.get("architectures") or [""])[0].lower()
        eos = hf.get("eos_token_id", 2)
        if isinstance(eos, (list, tuple)):
            eos = eos[0]
        return cls(
            vocab_size=hf["vocab_size"],
            num_layers=hf["num_hidden_layers"],
            hidden_size=hf["hidden_size"],
            num_heads=hf["num_attention_heads"],
            num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
            intermediate_size=hf["intermediate_size"],
            rope_theta=float(hf.get("rope_theta", 10000.0)),
            norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
            attention_bias=bool(hf.get("attention_bias", "qwen2" in arch)),
            tie_embeddings=bool(hf.get("tie_word_embeddings", False)),
            eos_token_id=int(eos),
        )


# ------------------------------------------------------------------ params

def random_decoder_params(cfg: DecoderConfig, seed: int = 0,
                          dtype=jnp.float32) -> Dict[str, Any]:
    """Deterministic small-scale init (tests/benches run without weights)."""
    rng = np.random.default_rng(seed)
    h, kv = cfg.hidden_size, cfg.num_kv_heads * cfg.head_dim
    nl, ff = cfg.num_layers, cfg.intermediate_size

    def tn(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    params = {
        "embed": tn(cfg.vocab_size, h),
        "layers": {
            "ln1": np.ones((nl, h), np.float32),
            "q_w": tn(nl, h, h), "k_w": tn(nl, h, kv), "v_w": tn(nl, h, kv),
            "o_w": tn(nl, h, h),
            "ln2": np.ones((nl, h), np.float32),
            "gate_w": tn(nl, h, ff), "up_w": tn(nl, h, ff),
            "down_w": tn(nl, ff, h),
        },
        "final_ln": np.ones((h,), np.float32),
    }
    if cfg.attention_bias:
        params["layers"].update({
            "q_b": np.zeros((nl, h), np.float32),
            "k_b": np.zeros((nl, kv), np.float32),
            "v_b": np.zeros((nl, kv), np.float32),
        })
    if not cfg.tie_embeddings:
        params["lm_head"] = tn(cfg.vocab_size, h)
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def decoder_params_from_torch_state_dict(
        sd: Mapping[str, Any], cfg: DecoderConfig,
        dtype=jnp.float32) -> Dict[str, Any]:
    """HF Qwen2ForCausalLM / LlamaForCausalLM state dict -> stacked pytree.

    HF stores Linear weights as [out, in]; this pytree stores [in, out] so
    the forward pass is plain ``x @ w``.
    """

    def get(name: str) -> np.ndarray:
        t = sd[name]
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def stack_w(fmt: str) -> np.ndarray:
        return np.stack([get(fmt.format(i)).T for i in range(cfg.num_layers)])

    def stack_v(fmt: str) -> np.ndarray:
        return np.stack([get(fmt.format(i)) for i in range(cfg.num_layers)])

    p = "model.layers.{}."
    params: Dict[str, Any] = {
        "embed": get("model.embed_tokens.weight"),
        "layers": {
            "ln1": stack_v(p + "input_layernorm.weight"),
            "q_w": stack_w(p + "self_attn.q_proj.weight"),
            "k_w": stack_w(p + "self_attn.k_proj.weight"),
            "v_w": stack_w(p + "self_attn.v_proj.weight"),
            "o_w": stack_w(p + "self_attn.o_proj.weight"),
            "ln2": stack_v(p + "post_attention_layernorm.weight"),
            "gate_w": stack_w(p + "mlp.gate_proj.weight"),
            "up_w": stack_w(p + "mlp.up_proj.weight"),
            "down_w": stack_w(p + "mlp.down_proj.weight"),
        },
        "final_ln": get("model.norm.weight"),
    }
    if cfg.attention_bias:
        params["layers"].update({
            "q_b": stack_v(p + "self_attn.q_proj.bias"),
            "k_b": stack_v(p + "self_attn.k_proj.bias"),
            "v_b": stack_v(p + "self_attn.v_proj.bias"),
        })
    if not cfg.tie_embeddings:
        params["lm_head"] = get("lm_head.weight")
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def quantize_decoder_params(params) -> Dict[str, Any]:
    """Weight-only int8 (symmetric, per-output-channel) for decode bandwidth.

    Decode is weight-read-bound: every generated token streams every matmul
    weight from HBM. int8 halves those bytes vs bf16; the int8->bf16
    convert happens in VMEM (XLA fuses it into the dot), so the MXU still
    sees bf16. Matmul weights become ``{"q": int8 [..., in, out],
    "s": f32 [..., out]}``; embeddings, norms and biases stay as-is.

    Tied embeddings get a SEPARATE int8 copy of the table for the output
    head: the input-side gather keeps reading the full-precision embed
    (a few rows per step — precision is free there), while the logits
    matmul — the single largest weight read of a decode step (V x H, e.g.
    272 MB bf16 at the Qwen2-0.5B shape) — streams the int8 copy. Costs
    +V x H bytes of HBM residency, saves V x H bytes of HBM traffic per
    generated token; per-vocab-row scales keep the argmax stable (greedy
    parity asserted in tests/test_decoder.py).
    """

    def quant(w):
        wf = np.asarray(w, np.float32)
        s = np.max(np.abs(wf), axis=-2, keepdims=True) / 127.0   # per out-col
        s = np.maximum(s, 1e-8)
        q = np.clip(np.round(wf / s), -127, 127).astype(np.int8)
        return {"q": jnp.asarray(q), "s": jnp.asarray(np.squeeze(s, -2))}

    out = {k: v for k, v in params.items() if k != "layers" and k != "lm_head"}
    out["layers"] = {
        k: (quant(v) if k.endswith("_w") else v)
        for k, v in params["layers"].items()
    }
    # [V, H] head (explicit lm_head, or the tied embed table): contract over
    # H (the last axis) — per-vocab-row scales
    head = params.get("lm_head", params["embed"])
    wf = np.asarray(head, np.float32)
    s = np.maximum(np.max(np.abs(wf), axis=-1, keepdims=True) / 127.0, 1e-8)
    q = np.clip(np.round(wf / s), -127, 127).astype(np.int8)
    out["lm_head"] = {"q": jnp.asarray(q), "s": jnp.asarray(s[..., 0])}
    return out


def fuse_decoder_params(params) -> Dict[str, Any]:
    """Fuse q/k/v -> one [H, H+2KV] matmul and gate/up -> one [H, 2F].

    Decode is a scan whose per-step cost is (weight bytes / HBM bandwidth)
    + per-op overhead; the k/v projections are tiny (H x KV, e.g. 896x128
    = 115 KB int8 at the Qwen2-0.5B shape) so their streams are
    latency-bound, not bandwidth-bound. Fusing turns 7 matmuls/layer into
    4 larger ones that each stream long enough to hit full bandwidth.
    Exact for bf16 (pure concatenation) AND for weight-only int8: the
    per-output-channel scales are independent per column, so concatenating
    quantized blocks equals quantizing the concatenation.

    Single-device layout only: `shard_decoder_params` Megatron-splits the
    UNfused weights (a fused [H_q | KV_k | KV_v] output axis would put
    device boundaries inside the parts), so fuse after deciding not to TP.
    The layer bodies accept either format.
    """

    def cat(ws):
        if isinstance(ws[0], dict):
            return {"q": jnp.concatenate([w["q"] for w in ws], axis=-1),
                    "s": jnp.concatenate([w["s"] for w in ws], axis=-1)}
        return jnp.concatenate(ws, axis=-1)

    lay = params["layers"]
    fused = {k: v for k, v in lay.items()
             if k not in ("q_w", "k_w", "v_w", "gate_w", "up_w",
                          "q_b", "k_b", "v_b")}
    fused["qkv_w"] = cat([lay["q_w"], lay["k_w"], lay["v_w"]])
    if "q_b" in lay:
        fused["qkv_b"] = jnp.concatenate(
            [lay["q_b"], lay["k_b"], lay["v_b"]], axis=-1)
    fused["gu_w"] = cat([lay["gate_w"], lay["up_w"]])
    return dict(params, layers=fused)


# ----------------------------------------------------------------- forward

def _mm(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ w for plain or weight-only-int8 quantized weights."""
    if isinstance(w, dict):
        return (x @ w["q"].astype(x.dtype)) * w["s"].astype(x.dtype)
    return x @ w


def _qkv(h: jnp.ndarray, lp, cfg: DecoderConfig):
    """(q, k, v) projections from either the fused or the split layout."""
    kv = cfg.num_kv_heads * cfg.head_dim
    if "qkv_w" in lp:
        qkv = _mm(h, lp["qkv_w"])
        if "qkv_b" in lp:
            qkv = qkv + lp["qkv_b"]
        return (qkv[..., : cfg.hidden_size],
                qkv[..., cfg.hidden_size: cfg.hidden_size + kv],
                qkv[..., cfg.hidden_size + kv:])
    q, k, v = _mm(h, lp["q_w"]), _mm(h, lp["k_w"]), _mm(h, lp["v_w"])
    if cfg.attention_bias:
        q, k, v = q + lp["q_b"], k + lp["k_b"], v + lp["v_b"]
    return q, k, v


def _ffn(h: jnp.ndarray, lp, cfg: DecoderConfig) -> jnp.ndarray:
    """SwiGLU from either the fused or the split layout."""
    if "gu_w" in lp:
        gu = _mm(h, lp["gu_w"])
        gate, up = gu[..., : cfg.intermediate_size], gu[..., cfg.intermediate_size:]
        return _mm(jax.nn.silu(gate) * up, lp["down_w"])
    return _mm(jax.nn.silu(_mm(h, lp["gate_w"])) * _mm(h, lp["up_w"]),
               lp["down_w"])


def _rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * inv).astype(x.dtype) * scale


def _rope_tables(positions: jnp.ndarray, theta: float, d: int):
    """(cos, sin) [B, S, 1, D/2] for `positions` [B, S]. Computed ONCE per
    forward/decode step and reused by every layer's q and k — the tables
    are position-only, so recomputing them inside the layer scan would
    cost 2 x num_layers identical transcendental ops per step."""
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = positions.astype(jnp.float32)[..., None] * freqs      # [B, S, D/2]
    return jnp.cos(ang)[:, :, None, :], jnp.sin(ang)[:, :, None, :]


def _rope_apply(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Rotate-half rotary embedding (HF convention). x: [B, S, H, D]."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding, HF rotate-half convention. x: [B, S, H, D]."""
    cos, sin = _rope_tables(positions, theta, x.shape[-1])
    return _rope_apply(x, cos, sin)


def _attend(q, k, v, mask, cfg: DecoderConfig):
    """q: [B,S,H,D]; k,v: [B,T,KV,D]; mask: [B,S,T] bool (True = attend).

    GQA contracts against the UN-replicated k/v: q reshapes to
    [B,S,KV,G,D] and the einsums broadcast over the group axis, so the
    cache is read once instead of materializing a groups-times copy
    (at decode S=1 the repeat would add 2 x groups x cache bytes of HBM
    traffic per layer per step).
    """
    b, s = q.shape[:2]
    groups = cfg.num_heads // cfg.num_kv_heads
    if groups > 1:
        qg = q.reshape(b, s, cfg.num_kv_heads, groups, cfg.head_dim)
        scores = jnp.einsum("bskgd,btkd->bkgst", qg, k) / np.sqrt(cfg.head_dim)
        scores = jnp.where(mask[:, None, None, :, :],
                           scores.astype(jnp.float32), jnp.float32(-1e30))
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("bkgst,btkd->bskgd", probs, v)
        return out.reshape(b, s, cfg.num_heads, cfg.head_dim)
    scores = jnp.einsum("bshd,bthd->bhst", q, k) / np.sqrt(cfg.head_dim)
    scores = jnp.where(mask[:, None, :, :], scores.astype(jnp.float32),
                       jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhst,bthd->bshd", probs, v)


def _layer(x, k_cache, v_cache, lp, rope, mask, cfg: DecoderConfig,
           attend=None):
    """One decoder layer over new positions, attending to (cache + new).

    x: [B, S, H]; k_cache/v_cache: [B, T, KV, D] (positions before the new
    block; T=0 for prefill); rope: (cos, sin) tables from `_rope_tables`
    (hoisted out of the layer scan — identical for every layer); returns
    (x_out, k_new, v_new) where k_new/v_new are the NEW positions'
    projections [B, S, KV, D]. `attend` overrides the attention op
    (the Pallas prefill fast path, ops/causal_flash.py) — it receives the
    post-rope (q, k_all, v_all) and carries its own masking.
    """
    b, s, _ = x.shape
    cos, sin = rope
    h = _rms_norm(x, lp["ln1"], cfg.norm_eps)
    q, k, v = _qkv(h, lp, cfg)
    q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    q = _rope_apply(q, cos, sin)
    k_new = _rope_apply(k, cos, sin)
    k_all = jnp.concatenate([k_cache, k_new], axis=1) if k_cache.shape[1] else k_new
    v_all = jnp.concatenate([v_cache, v], axis=1) if v_cache.shape[1] else v
    if attend is not None:
        attn = attend(q, k_all, v_all).reshape(b, s, cfg.hidden_size)
    else:
        attn = _attend(q, k_all, v_all, mask, cfg).reshape(b, s, cfg.hidden_size)
    x = x + _mm(attn, lp["o_w"])
    h = _rms_norm(x, lp["ln2"], cfg.norm_eps)
    return x + _ffn(h, lp, cfg), k_new, v


def _logits(params, x, cfg: DecoderConfig):
    x = _rms_norm(x, params["final_ln"], cfg.norm_eps)
    # tied checkpoints normally read the embed table; quantization installs
    # a separate int8 "lm_head" copy for this matmul (see
    # quantize_decoder_params), which takes precedence when present
    head = params.get("lm_head", params["embed"])
    if isinstance(head, dict):   # int8 per-vocab-row
        raw = jnp.einsum("bsh,vh->bsv", x, head["q"].astype(x.dtype))
        return (raw * head["s"].astype(x.dtype)).astype(jnp.float32)
    return jnp.einsum("bsh,vh->bsv", x, head).astype(jnp.float32)


def decoder_forward(params, input_ids, cfg: DecoderConfig,
                    attention_mask: Optional[jnp.ndarray] = None):
    """Full-sequence causal forward -> logits [B, S, V] (prefill shape).

    ``attention_mask`` marks real tokens (1) vs LEFT padding (0); positions
    are counted over real tokens so left-padded prompts match HF exactly.
    """
    b, s = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)
    positions = jnp.cumsum(attention_mask, axis=1) - 1          # [B, S]
    positions = jnp.maximum(positions, 0)
    causal = jnp.tril(jnp.ones((s, s), bool))[None]             # [1, S, S]
    mask = causal & (attention_mask[:, None, :] == 1)           # [B, S, S]
    x = params["embed"][input_ids]
    rope = _rope_tables(positions, cfg.rope_theta, cfg.head_dim)

    empty_k = jnp.zeros((b, 0, cfg.num_kv_heads, cfg.head_dim), x.dtype)
    empty_v = empty_k

    def body(h, lp):
        h, _, _ = _layer(h, empty_k, empty_v, lp, rope, mask, cfg)
        return h, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return _logits(params, x, cfg)


# ---------------------------------------------------------------- generate

def _prefill(params, input_ids, attention_mask, max_total: int,
             cfg: DecoderConfig, prefill_impl: str = "xla"):
    """Run the prompt, return (last-position logits, full-size KV cache).

    prefill_impl="pallas" routes attention through the causal flash kernel
    (ops/causal_flash.py): scores never touch HBM, vs ~940 MB/layer of f32
    scores at the 4096 bucket on the XLA path. Requires contiguous LEFT
    padding (what every generate caller produces) — gate via
    `resolve_prefill_impl`. The masks are equivalent: the kernel's
    (key_pos <= q_pos) & (key_pos >= pad_len) equals tril & (mask == 1)
    when the zeros of attention_mask form a prefix.
    """
    b, s = input_ids.shape
    positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
    x = params["embed"][input_ids]
    rope = _rope_tables(positions, cfg.rope_theta, cfg.head_dim)
    empty = jnp.zeros((b, 0, cfg.num_kv_heads, cfg.head_dim), x.dtype)
    if prefill_impl == "pallas":
        from financial_rag_tpu.ops.causal_flash import causal_flash_prefill

        pad_len = jnp.int32(s) - jnp.sum(attention_mask, axis=1).astype(jnp.int32)
        mask = None

        def attend(q, k, v):
            return causal_flash_prefill(
                q.reshape(b, s, -1), k.reshape(b, s, -1), v.reshape(b, s, -1),
                pad_len, num_q_heads=cfg.num_heads,
                num_kv_heads=cfg.num_kv_heads,
            ).reshape(b, s, cfg.num_heads, cfg.head_dim)
    else:
        attend = None
        causal = jnp.tril(jnp.ones((s, s), bool))[None]
        mask = causal & (attention_mask[:, None, :] == 1)

    def body(h, lp):
        h, k_new, v_new = _layer(h, empty, empty, lp, rope, mask, cfg,
                                 attend=attend)
        return h, (k_new, v_new)

    x, (k_seq, v_seq) = jax.lax.scan(body, x, params["layers"])
    # caches sized for the whole generation up front: [L, B, max_total, KV, D]
    pad = max_total - s
    k_cache = jnp.pad(k_seq, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    v_cache = jnp.pad(v_seq, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    return _logits(params, x[:, -1:, :], cfg)[:, 0], k_cache, v_cache


def _decode_one(params, token, pos, slot, k_cache, v_cache, prompt_mask,
                cfg: DecoderConfig):
    """One decode step. token: [B], pos: [B] rotary position ids of `token`
    (real-token counts, so left padding doesn't shift the rotation), slot:
    scalar cache slot to write (padded prompt length + step index — uniform
    across the batch because the cache is laid out in padded coordinates).
    Attention masks out slots beyond this step and prompt-padding slots.
    """
    b = token.shape[0]
    max_total = k_cache.shape[2]
    x = params["embed"][token][:, None, :]               # [B, 1, H]
    valid = jnp.arange(max_total)[None, :] <= slot       # [1, T] filled slots
    mask = (valid & prompt_mask)[:, None, :]             # [B, 1, T]
    cos, sin = _rope_tables(pos[:, None], cfg.rope_theta, cfg.head_dim)

    def body2(h, xs):
        lp, kc, vc = xs
        hh = _rms_norm(h, lp["ln1"], cfg.norm_eps)
        q, k, v = _qkv(hh, lp, cfg)
        q = q.reshape(b, 1, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
        q = _rope_apply(q, cos, sin)
        k = _rope_apply(k, cos, sin)
        kc = jax.lax.dynamic_update_slice_in_dim(kc, k, slot, axis=1)
        vc = jax.lax.dynamic_update_slice_in_dim(vc, v, slot, axis=1)
        attn = _attend(q, kc, vc, mask, cfg).reshape(b, 1, cfg.hidden_size)
        h = h + _mm(attn, lp["o_w"])
        hh = _rms_norm(h, lp["ln2"], cfg.norm_eps)
        return h + _ffn(hh, lp, cfg), (kc, vc)

    x, (k_cache, v_cache) = jax.lax.scan(body2, x,
                                         (params["layers"], k_cache, v_cache))
    return _logits(params, x, cfg)[:, 0], k_cache, v_cache


def _sample(logits, rng, temperature: float, top_k: int):
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if top_k > 0:
        vals, _ = jax.lax.top_k(logits, top_k)
        logits = jnp.where(logits < vals[..., -1:], -1e30, logits)
    return jax.random.categorical(rng, logits / temperature).astype(jnp.int32)


def resolve_prefill_impl(cfg: DecoderConfig, seq_len: int, *,
                         dtype_bytes: int = 2) -> str:
    """'pallas' when the causal flash prefill kernel applies, else 'xla'.

    pallas needs: a real TPU backend (interpret mode would run the grid in
    Python), a long enough prompt to beat XLA's fused path (the score
    traffic the kernel removes scales with S^2 — at 512 it's ~1 GB total,
    at 4096 ~68 GB), block-divisible lengths (the serving buckets are
    powers of two), 128-lane-aligned head widths, and K+V of one batch row
    resident in VMEM (double-buffered) — true for GQA's narrow kv width
    (128 at the Qwen2-0.5B shape), not for wide-MHA checkpoints. Callers
    under GSPMD tensor parallelism must stay on 'xla': a Pallas call has
    no partitioning rule and would be replicated.
    """
    import jax

    if jax.default_backend() != "tpu":
        return "xla"
    if seq_len < 1024 or seq_len % 512:
        return "xla"
    hw = cfg.num_heads * cfg.head_dim
    kvw = cfg.num_kv_heads * cfg.head_dim
    if hw != cfg.hidden_size or hw % 128 or kvw % 128:
        return "xla"
    if 2 * 2 * seq_len * kvw * dtype_bytes > 8 * 1024 * 1024:
        return "xla"
    return "pallas"


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "temperature",
                                   "top_k", "prefill_impl"))
def generate_tokens(params, input_ids, attention_mask, rng,
                    *, cfg: DecoderConfig, max_new_tokens: int,
                    temperature: float = 0.0, top_k: int = 0,
                    prefill_impl: str = "xla"):
    """ONE device dispatch: prefill + max_new_tokens decode steps.

    input_ids/attention_mask: [B, S] LEFT-padded prompts. Returns
    [B, max_new_tokens] int32; callers trim at eos host-side. Once a row
    emits eos it keeps feeding eos (its later logits are discarded), so
    trimmed output is independent of max_new_tokens.
    """
    b, s = input_ids.shape
    max_total = s + max_new_tokens
    last_logits, k_cache, v_cache = _prefill(params, input_ids,
                                             attention_mask, max_total, cfg,
                                             prefill_impl)
    # decode-step mask over cache slots: prompt padding stays invisible
    prompt_mask = jnp.concatenate(
        [attention_mask == 1,
         jnp.ones((b, max_new_tokens), bool)], axis=1)           # [B, T]
    pos0 = jnp.sum(attention_mask, axis=1)                       # next position
    rngs = jax.random.split(rng, max_new_tokens)
    tok0 = _sample(last_logits, rngs[0], temperature, top_k)
    done0 = tok0 == cfg.eos_token_id

    def step(carry, rng_i):
        i, tok, done, kc, vc = carry
        logits, kc, vc = _decode_one(params, tok, pos0 + i, s + i, kc, vc,
                                     prompt_mask, cfg)
        nxt = _sample(logits, rng_i, temperature, top_k)
        nxt = jnp.where(done, cfg.eos_token_id, nxt)
        done = done | (nxt == cfg.eos_token_id)
        return (i + 1, nxt, done, kc, vc), tok

    (_, last, _, _, _), toks = jax.lax.scan(
        step, (jnp.zeros((), jnp.int32), tok0, done0, k_cache, v_cache),
        rngs[1:])
    toks = jnp.concatenate([jnp.moveaxis(toks, 0, 1), last[:, None]], axis=1)
    return toks


# ------------------------------------------- speculative (prompt-lookup)

def _verify_block(params, toks, pos0, slot0, k_cache, v_cache, prompt_mask,
                  cfg: DecoderConfig):
    """Decode S tokens in ONE pass: feed toks [1, S], write their k/v at
    cache slots [slot0, slot0+S), return logits at every position.

    The speculation workhorse. At batch 1 a decode step's cost is the
    weight stream from HBM; the S-token block streams the SAME bytes as a
    1-token step (activations are KBs), so verifying S-1 drafted tokens is
    nearly free. Causality inside the block and against the cache is one
    mask: position i attends slot j iff j <= slot0+i (its own and earlier
    slots — the block's entries are written before attending) and j is not
    prompt padding.
    """
    b, s = toks.shape
    positions = pos0[None, None] + jnp.arange(s)[None, :]        # [1, S]
    max_total = k_cache.shape[2]
    jslots = jnp.arange(max_total)[None, None, :]                # [1, 1, T]
    mask = (jslots <= (slot0 + jnp.arange(s))[None, :, None]) \
        & prompt_mask[:, None, :]                                # [1, S, T]
    x = params["embed"][toks]                                    # [1, S, H]
    cos, sin = _rope_tables(positions, cfg.rope_theta, cfg.head_dim)

    def body(h, xs):
        lp, kc, vc = xs
        hh = _rms_norm(h, lp["ln1"], cfg.norm_eps)
        q, k, v = _qkv(hh, lp, cfg)
        q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        q = _rope_apply(q, cos, sin)
        k = _rope_apply(k, cos, sin)
        kc = jax.lax.dynamic_update_slice_in_dim(kc, k, slot0, axis=1)
        vc = jax.lax.dynamic_update_slice_in_dim(vc, v, slot0, axis=1)
        attn = _attend(q, kc, vc, mask, cfg).reshape(b, s, cfg.hidden_size)
        h = h + _mm(attn, lp["o_w"])
        hh = _rms_norm(h, lp["ln2"], cfg.norm_eps)
        return h + _ffn(hh, lp, cfg), (kc, vc)

    x, (k_cache, v_cache) = jax.lax.scan(body, x,
                                         (params["layers"], k_cache, v_cache))
    return _logits(params, x, cfg)[0], k_cache, v_cache          # [S, V]


def _verify_block_rows(params, toks, pos0, slot0, k_cache, v_cache,
                       prompt_mask, cfg: DecoderConfig):
    """_verify_block generalized to a row batch with PER-ROW rotary
    positions: toks [B, S], pos0 [B], slot0 a scalar SHARED write slot
    (the continuous engine's shared-write-head cache layout). Returns
    (logits [B, S, V], k_cache, v_cache). Same masking contract as
    _verify_block: position i attends cache slot j iff j <= slot0 + i and
    the row's prompt mask allows j — which is also what hides slots a
    previous speculative block REJECTED for this row."""
    b, s = toks.shape
    positions = pos0[:, None] + jnp.arange(s)[None, :]           # [B, S]
    max_total = k_cache.shape[2]
    jslots = jnp.arange(max_total)[None, None, :]                # [1, 1, T]
    mask = (jslots <= (slot0 + jnp.arange(s))[None, :, None]) \
        & prompt_mask[:, None, :]                                # [B, S, T]
    x = params["embed"][toks]                                    # [B, S, H]
    cos, sin = _rope_tables(positions, cfg.rope_theta, cfg.head_dim)

    def body(h, xs):
        lp, kc, vc = xs
        hh = _rms_norm(h, lp["ln1"], cfg.norm_eps)
        q, k, v = _qkv(hh, lp, cfg)
        q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        q = _rope_apply(q, cos, sin)
        k = _rope_apply(k, cos, sin)
        kc = jax.lax.dynamic_update_slice_in_dim(kc, k, slot0, axis=1)
        vc = jax.lax.dynamic_update_slice_in_dim(vc, v, slot0, axis=1)
        attn = _attend(q, kc, vc, mask, cfg).reshape(b, s, cfg.hidden_size)
        h = h + _mm(attn, lp["o_w"])
        hh = _rms_norm(h, lp["ln2"], cfg.norm_eps)
        return h + _ffn(hh, lp, cfg), (kc, vc)

    x, (k_cache, v_cache) = jax.lax.scan(body, x,
                                         (params["layers"], k_cache, v_cache))
    return _logits(params, x, cfg), k_cache, v_cache             # [B, S, V]


def _pl_drafts(ctx, slot, valid_from, *, ngram: int, draft_k: int):
    """Prompt-lookup drafting on device: find the most recent earlier
    occurrence of the sequence's last `ngram` tokens and propose the
    `draft_k` tokens that followed it (falling back to ngram-1, then to
    no match). ctx: [T] fed tokens by cache slot, with the pending token
    already written at `slot`; valid_from: first non-padding slot.

    Draft quality only affects the ACCEPTANCE RATE, never correctness —
    the verify step recomputes every token — so clipped/garbage reads past
    the sequence end are harmless by construction. O(T * ngram) vector
    compares: microseconds next to a decode step.
    """
    t = ctx.shape[0]
    idx = jnp.arange(t)

    def match_end(n):
        m = idx < slot                    # strictly before the current end
        for d in range(n):
            tgt = ctx[jnp.maximum(slot - d, 0)]
            cand = jnp.take(ctx, jnp.maximum(idx - d, 0))
            m &= (cand == tgt) & (idx - d >= valid_from)
        return jnp.max(jnp.where(m, idx, -1))                    # -1 = none

    e = match_end(ngram)
    if ngram > 1:
        e = jnp.where(e >= 0, e, match_end(ngram - 1))
    start = jnp.where(e >= 0, e + 1, 0)
    return jax.lax.dynamic_slice(ctx, (start,), (draft_k,))      # [K]


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "draft_k",
                                   "ngram", "prefill_impl"))
def generate_tokens_spec(params, input_ids, attention_mask,
                         *, cfg: DecoderConfig, max_new_tokens: int,
                         draft_k: int = 7, ngram: int = 3,
                         prefill_impl: str = "xla"):
    """Greedy generation with prompt-lookup speculative decoding. ONE
    device dispatch; returns (tokens [1, max_new_tokens], steps scalar).

    RAG answers quote the retrieved context, so drafting each next span by
    n-gram match against the prompt (transformers' prompt_lookup_num_tokens
    idea) and verifying draft_k tokens per step in one `_verify_block`
    accepts multi-token spans at single-step cost. Output (trimmed at eos)
    is greedy `generate_tokens` output — exactly so in exact arithmetic
    (pinned by f32 tests); under bf16 activations a near-tie (top-2 logit
    gap ~1 ulp) can resolve differently between the S-token block and the
    1-token step, the same property as any batched-verify speculative
    decoder (HF assisted generation included). Acceptance only decides
    how many steps it takes, `steps` reports that. Batch 1 only: rows
    would accept different counts and the KV cache is laid out in shared
    slot coordinates (batched requests take `generate_tokens`, whose
    batching already amortizes the weight stream).
    """
    b, s = input_ids.shape
    assert b == 1, "speculative decoding is a batch-1 fast path"
    blk = draft_k + 1
    eos = jnp.int32(cfg.eos_token_id)
    # slack so a final overshooting block never writes past the buffers
    max_total = s + max_new_tokens + blk
    last_logits, k_cache, v_cache = _prefill(params, input_ids,
                                             attention_mask, max_total, cfg,
                                             prefill_impl)
    prompt_mask = jnp.concatenate(
        [attention_mask == 1,
         jnp.ones((b, max_new_tokens + blk), bool)], axis=1)     # [1, T]
    pos0 = jnp.sum(attention_mask, axis=1)[0]        # rotary pos of tok0
    valid_from = jnp.int32(s) - pos0                 # first real slot
    tok0 = jnp.argmax(last_logits[0]).astype(jnp.int32)
    ctx = jnp.concatenate([input_ids[0],
                           jnp.zeros((max_new_tokens + blk,), jnp.int32)])
    # tok0 is the first OUTPUT token (like generate_tokens); it is also the
    # first block's fed token, whose successors the loop emits
    out0 = jnp.full((max_new_tokens + blk,), eos, jnp.int32).at[0].set(tok0)

    # carry: g tokens emitted, steps, pending token, done, cache slot of the
    # pending token, its rotary position, out buffer, ctx, caches
    carry0 = (jnp.int32(1), jnp.int32(0), tok0, tok0 == eos, jnp.int32(s),
              pos0, out0, ctx, k_cache, v_cache)

    def cond(c):
        g, _, _, done, *_ = c
        return (~done) & (g < max_new_tokens)

    def body(c):
        g, steps, tok, done, slot, pos, out, ctx, kc, vc = c
        ctx = ctx.at[slot].set(tok)
        drafts = _pl_drafts(ctx, slot, valid_from, ngram=ngram,
                            draft_k=draft_k)
        block = jnp.concatenate([tok[None], drafts])[None]       # [1, blk]
        logits, kc, vc = _verify_block(params, block, pos, slot, kc, vc,
                                       prompt_mask, cfg)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)    # [blk]
        acc = jnp.sum(jnp.cumprod(
            (drafts == preds[:draft_k]).astype(jnp.int32)))      # 0..K
        is_eos = preds == eos
        first_eos = jnp.where(is_eos.any(), jnp.argmax(is_eos), blk)
        n_emit = jnp.minimum(acc + 1, first_eos + 1).astype(jnp.int32)
        emit = jnp.where(jnp.arange(blk) < n_emit, preds, eos)
        out = jax.lax.dynamic_update_slice(out, emit, (g,))
        # record fed tokens for future lookups (slots >= slot+n_emit hold
        # eos padding until overwritten; lookups mask them out)
        ctx = jax.lax.dynamic_update_slice(ctx, emit, (slot + 1,))
        last = jnp.take(emit, n_emit - 1)
        return (g + n_emit, steps + 1, last, jnp.take(is_eos, n_emit - 1),
                slot + n_emit, pos + n_emit, out, ctx, kc, vc)

    g, steps, *_rest = jax.lax.while_loop(cond, body, carry0)
    out = _rest[4]
    return out[None, :max_new_tokens], steps


def _spec_seg_scan(params, state, out0, g0, *, cfg: DecoderConfig,
                   segment: int, draft_k: int, ngram: int):
    """Run speculative steps until >= segment tokens land in out0 (or eos).

    out0: [segment+draft_k+1] eos-filled local block buffer; g0: tokens
    already in it. Returns (block, n_valid, new_state). Shares its loop
    body shape with generate_tokens_spec; state keys: tok, done, slot,
    pos, ctx, kc, vc, pm, vf, total (total tokens emitted so far, capping
    the stream at the cache size).
    """
    blk = draft_k + 1
    eos = jnp.int32(cfg.eos_token_id)
    budget = state["ctx"].shape[0]               # slots; never write past
    carry0 = (g0, state["tok"], state["done"], state["slot"], state["pos"],
              state["total"], out0, state["ctx"], state["kc"], state["vc"])

    def cond(c):
        g, _, done, slot, *_ = c
        return (~done) & (g < segment) & (slot + blk < budget)

    def body(c):
        g, tok, done, slot, pos, total, out, ctx, kc, vc = c
        ctx = ctx.at[slot].set(tok)
        drafts = _pl_drafts(ctx, slot, state["vf"], ngram=ngram,
                            draft_k=draft_k)
        block = jnp.concatenate([tok[None], drafts])[None]
        logits, kc, vc = _verify_block(params, block, pos, slot, kc, vc,
                                       state["pm"], cfg)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        acc = jnp.sum(jnp.cumprod(
            (drafts == preds[:draft_k]).astype(jnp.int32)))
        is_eos = preds == eos
        first_eos = jnp.where(is_eos.any(), jnp.argmax(is_eos), blk)
        n_emit = jnp.minimum(acc + 1, first_eos + 1).astype(jnp.int32)
        emit = jnp.where(jnp.arange(blk) < n_emit, preds, eos)
        out = jax.lax.dynamic_update_slice(out, emit, (g,))
        ctx = jax.lax.dynamic_update_slice(ctx, emit, (slot + 1,))
        return (g + n_emit, jnp.take(emit, n_emit - 1),
                jnp.take(is_eos, n_emit - 1), slot + n_emit, pos + n_emit,
                total + n_emit, out, ctx, kc, vc)

    g, tok, done, slot, pos, total, out, ctx, kc, vc = jax.lax.while_loop(
        cond, body, carry0)
    new_state = dict(state, tok=tok, done=done, slot=slot, pos=pos,
                     total=total, ctx=ctx, kc=kc, vc=vc)
    return out, g, new_state


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "segment",
                                   "draft_k", "ngram", "prefill_impl"))
def _spec_gen_start(params, input_ids, attention_mask, *, cfg: DecoderConfig,
                    max_new_tokens: int, segment: int, draft_k: int,
                    ngram: int, prefill_impl: str = "xla"):
    """Prefill + the first speculative segment (includes tok0)."""
    b, s = input_ids.shape
    blk = draft_k + 1
    eos = jnp.int32(cfg.eos_token_id)
    max_total = s + max_new_tokens + blk
    last_logits, kc, vc = _prefill(params, input_ids, attention_mask,
                                   max_total, cfg, prefill_impl)
    pm = jnp.concatenate([attention_mask == 1,
                          jnp.ones((b, max_new_tokens + blk), bool)], axis=1)
    pos0 = jnp.sum(attention_mask, axis=1)[0]
    tok0 = jnp.argmax(last_logits[0]).astype(jnp.int32)
    ctx = jnp.concatenate([input_ids[0],
                           jnp.zeros((max_new_tokens + blk,), jnp.int32)])
    state = {"tok": tok0, "done": tok0 == eos, "slot": jnp.int32(s),
             "pos": pos0, "total": jnp.int32(1), "ctx": ctx, "kc": kc,
             "vc": vc, "pm": pm, "vf": jnp.int32(s) - pos0}
    out0 = jnp.full((segment + blk,), eos, jnp.int32).at[0].set(tok0)
    return _spec_seg_scan(params, state, out0, jnp.int32(1), cfg=cfg,
                          segment=segment, draft_k=draft_k, ngram=ngram)


@partial(jax.jit, static_argnames=("cfg", "segment", "draft_k", "ngram"))
def _spec_gen_more(params, state, *, cfg: DecoderConfig, segment: int,
                   draft_k: int, ngram: int):
    blk = draft_k + 1
    out0 = jnp.full((segment + blk,), jnp.int32(cfg.eos_token_id), jnp.int32)
    return _spec_seg_scan(params, state, out0, jnp.int32(0), cfg=cfg,
                          segment=segment, draft_k=draft_k, ngram=ngram)


def generate_stream_spec(params, input_ids, attention_mask,
                         *, cfg: DecoderConfig, max_new_tokens: int,
                         segment: int = 48, draft_k: int = 7,
                         ngram: int = 3, prefill_impl: str = "xla"):
    """Streaming speculative greedy generation (batch 1). Yields [1, n]
    int32 blocks; the concatenation (trimmed at eos) equals greedy
    ``generate_tokens`` output trimmed at eos (exactly in exact
    arithmetic; see generate_tokens_spec on bf16 near-ties). Each segment is one device
    dispatch that runs prompt-lookup speculation internally, so both the
    first block and every later one land in fewer weight-stream-bound
    steps than plain ``generate_stream``.
    """
    assert input_ids.shape[0] == 1, "speculative streaming is batch-1"
    seg = max(1, min(segment, max_new_tokens))
    block, n, state = _spec_gen_start(params, input_ids, attention_mask,
                                      cfg=cfg, max_new_tokens=max_new_tokens,
                                      segment=seg, draft_k=draft_k,
                                      ngram=ngram, prefill_impl=prefill_impl)
    emitted = 0
    while True:
        block_np, n_i = np.asarray(block), int(n)
        keep = min(n_i, max_new_tokens - emitted)
        if keep > 0:
            yield block_np[None, :keep]
            emitted += keep
        if emitted >= max_new_tokens:
            return
        if keep and block_np[keep - 1] == cfg.eos_token_id:
            return
        if n_i == 0:                    # defensive: no progress means done
            return
        block, n, state = _spec_gen_more(params, state, cfg=cfg, segment=seg,
                                         draft_k=draft_k, ngram=ngram)


# ------------------------------------------------------------- streaming

def _gen_scan(params, state, rngs, cfg: DecoderConfig,
              temperature: float, top_k: int):
    """Advance the generation state by len(rngs) decode steps.

    state: {g, tok, done, kc, vc, pos0, pm, slot0} — tok is the last
    sampled-but-not-yet-fed token; ys are the newly sampled tokens, so
    chaining segments reproduces the one-shot token sequence exactly
    (same per-step rng stream).
    """
    pos0, pm, slot0 = state["pos0"], state["pm"], state["slot0"]

    def step(carry, rng_i):
        g, tok, done, kc, vc = carry
        logits, kc, vc = _decode_one(params, tok, pos0 + g, slot0 + g,
                                     kc, vc, pm, cfg)
        nxt = _sample(logits, rng_i, temperature, top_k)
        nxt = jnp.where(done, cfg.eos_token_id, nxt)
        done = done | (nxt == cfg.eos_token_id)
        return (g + 1, nxt, done, kc, vc), nxt

    (g, tok, done, kc, vc), ys = jax.lax.scan(
        step, (state["g"], state["tok"], state["done"],
               state["kc"], state["vc"]), rngs)
    new_state = dict(state, g=g, tok=tok, done=done, kc=kc, vc=vc)
    return jnp.moveaxis(ys, 0, 1), new_state


@partial(jax.jit, static_argnames=("cfg", "temperature", "top_k",
                                   "prefill_impl"))
def _gen_start(params, input_ids, attention_mask, rngs,
               *, cfg: DecoderConfig, temperature: float, top_k: int,
               prefill_impl: str = "xla"):
    """Prefill + the first len(rngs) tokens; returns (tokens, state).

    The KV cache is sized for the WHOLE stream up front (prompt +
    total_new, inferred from the prompt-mask the caller sizes), so later
    segments never reallocate. Here total_new rides in via the rng count of
    the first segment only; the caller passes total_new explicitly through
    the cache by sizing rngs: see generate_stream.
    """
    b, s = input_ids.shape
    seg, total_new = rngs.shape[0], rngs.shape[1]
    rngs = rngs[:, 0]   # [seg, 2] keys padded on axis 1 to carry total_new
    max_total = s + total_new
    last_logits, kc, vc = _prefill(params, input_ids, attention_mask,
                                   max_total, cfg, prefill_impl)
    pm = jnp.concatenate([attention_mask == 1,
                          jnp.ones((b, total_new), bool)], axis=1)
    tok0 = _sample(last_logits, rngs[0], temperature, top_k)
    state = {
        "g": jnp.zeros((), jnp.int32),
        "tok": tok0,
        "done": tok0 == cfg.eos_token_id,
        "kc": kc, "vc": vc,
        "pos0": jnp.sum(attention_mask, axis=1),
        "pm": pm,
        "slot0": jnp.int32(s),
    }
    ys, state = _gen_scan(params, state, rngs[1:], cfg, temperature, top_k)
    return jnp.concatenate([tok0[:, None], ys], axis=1), state


@partial(jax.jit, static_argnames=("cfg", "temperature", "top_k"))
def _gen_more(params, state, rngs, *, cfg: DecoderConfig,
              temperature: float, top_k: int):
    return _gen_scan(params, state, rngs, cfg, temperature, top_k)


def generate_stream(params, input_ids, attention_mask, rng,
                    *, cfg: DecoderConfig, max_new_tokens: int,
                    segment: int = 48, temperature: float = 0.0,
                    top_k: int = 0, prefill_impl: str = "xla"):
    """Yield [B, <=segment] int32 token blocks; concatenated output equals
    ``generate_tokens`` exactly (same rng stream per step). Each block is
    one device dispatch, so time-to-first-tokens ~= prefill + one segment
    instead of the full generation. Stops early once every row has hit eos
    (detected from the block itself — no extra device round-trip).
    """
    import math

    b = input_ids.shape[0]
    seg = max(1, min(segment, max_new_tokens))
    n_seg = math.ceil(max_new_tokens / seg)
    total_new = n_seg * seg                   # cache sized for whole stream
    keys = jax.random.split(rng, total_new)
    # smuggle total_new into the jitted start via a shape: [seg, total_new, 2]
    keys_start = jnp.broadcast_to(keys[:seg, None, :], (seg, total_new, 2))
    toks, state = _gen_start(params, input_ids, attention_mask, keys_start,
                             cfg=cfg, temperature=temperature, top_k=top_k,
                             prefill_impl=prefill_impl)
    emitted = 0
    while True:
        block = np.asarray(toks)
        keep = min(block.shape[1], max_new_tokens - emitted)
        yield block[:, :keep]
        emitted += keep
        if emitted >= max_new_tokens:
            return
        if (block[:, -1] == cfg.eos_token_id).all():
            return                            # every row finished mid-stream
        toks, state = _gen_more(params, state, keys[emitted:emitted + seg],
                                cfg=cfg, temperature=temperature, top_k=top_k)


# ----------------------------------------------------- multi-chip sharding

def shard_decoder_params(params, mesh, cfg: DecoderConfig,
                         model_axis: str = "model"):
    """Place the param pytree for tensor parallelism over ``model_axis``.

    GSPMD recipe (scaling-book style): annotate the weights, reuse the SAME
    jitted ``generate_tokens`` — XLA inserts the collectives. Layout is the
    Megatron split: q/k/v and gate/up shard their OUTPUT features (heads /
    ffn columns), o and down shard their INPUT features, so each layer
    needs one all-reduce after attention and one after the FFN. The
    lm_head shards its vocab rows (the [B,1,V] decode logits gather over
    ICI is trivial). kv heads must divide the axis size — asserted — so
    GQA groups stay device-local.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    tp = mesh.shape[model_axis]
    assert cfg.num_kv_heads % tp == 0, (
        f"num_kv_heads={cfg.num_kv_heads} not divisible by {model_axis}={tp}")

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    specs = {
        "embed": ns(),                                # gathered by token id
        "final_ln": ns(),
        "layers": {
            "ln1": ns(), "ln2": ns(),
            "q_w": ns(None, None, model_axis),
            "k_w": ns(None, None, model_axis),
            "v_w": ns(None, None, model_axis),
            "o_w": ns(None, model_axis, None),
            "gate_w": ns(None, None, model_axis),
            "up_w": ns(None, None, model_axis),
            "down_w": ns(None, model_axis, None),
        },
    }
    if cfg.attention_bias:
        specs["layers"].update({
            "q_b": ns(None, model_axis),
            "k_b": ns(None, model_axis),
            "v_b": ns(None, model_axis),
        })
    if not cfg.tie_embeddings:
        # vocab rows when they divide evenly (they do for real checkpoints;
        # Qwen2's 151,936 = 2^7 x 1187), else replicate
        specs["lm_head"] = (ns(model_axis, None)
                            if cfg.vocab_size % tp == 0 else ns())
    return jax.tree.map(jax.device_put, params, specs)


def shard_decoder_inputs(input_ids, attention_mask, mesh,
                         data_axis: str = "data"):
    """Batch-shard prompts over ``data_axis`` (replicated over model)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = NamedSharding(mesh, P(data_axis, None))
    return jax.device_put(input_ids, s), jax.device_put(attention_mask, s)
