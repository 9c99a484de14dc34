"""TPU-native BERT encoder stack (functional JAX).

Replaces the reference's two model paths — the torch `SentenceTransformer`
runtime and the degraded 6-layer `MinimalBertModel` fallback (reference
local_embedder.py:194-251) — with one true 12-layer BERT forward:

- parameters are a plain pytree with layer weights **stacked on a leading
  axis** and the stack executed with `lax.scan`, so XLA traces one layer
  regardless of depth (fast compiles, identical MXU code per layer);
- attention is pluggable: fused Pallas flash attention on TPU
  (financial_rag_tpu/ops/flash_attention.py) or a plain XLA einsum path;
- pooling implements the checkpoints' true behavior — CLS for
  BAAI/bge-small, masked-mean for thenlper/gte-small — followed by L2
  normalization, optionally as one fused Pallas kernel
  (financial_rag_tpu/ops/pool_norm.py). The reference's local fallback
  wrongly mean-pools both models (reference local_embedder.py:171-191);
- activations run in a configurable compute dtype (bfloat16 on TPU) with
  float32 layer norms and float32 matmul accumulation
  (`preferred_element_type`).

Batched by construction: the reference encodes one text at a time
(reference local_embedder.py:160-184); here [B, S] token batches are the
unit of work so the MXU stays fed.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from financial_rag_tpu.config import ModelConfig

# A BertParams is a nested dict pytree:
# {
#   "embeddings": {word, position, token_type, ln_scale, ln_bias},
#   "layers": {q_w,q_b,k_w,k_b,v_w,v_b,o_w,o_b,attn_ln_scale,attn_ln_bias,
#              ffn_in_w,ffn_in_b,ffn_out_w,ffn_out_b,ffn_ln_scale,ffn_ln_bias}
#             (every leaf has leading axis = num_layers),
#   "pooler": {w, b}            (optional — BertPooler dense+tanh)
#   "classifier": {w, b}        (optional — sequence classification head)
# }
BertParams = Dict[str, Any]

NEG_INF = -1e9


def resolve_attention_impl(seq_len: int | None = None, *,
                           model_sharded: bool = False) -> str:
    """One policy for attention_impl="auto" (used by the encoder service,
    the cross-encoder reranker and the training factory):

    - pallas only on TPU (interpret mode executes the grid in Python);
    - pallas only at seq >= 256 when a seq length is known — at short
      sequences the XLA fusion is already fast and the kernel's block
      geometry pays overhead. EXCEPTION: under a sharded model axis the
      fused kernel wins at every length, because the alternative (XLA
      attention) materializes each layer's [B, N, S, S] probabilities for
      the backward pass — the 27GB OOM that made pallas the training
      default in the first place;
    - pallas_tp when the model axis is sharded (tensor parallel): the
      Pallas custom calls carry no GSPMD partitioning rule, so plain-jit
      SPMD propagation would replicate the model-sharded operands —
      instead ops/flash_attention.flash_attention_tp shard_maps the same
      kernel over its mesh, each device running its local heads. Callers
      must pass tp_mesh through bert_forward/bert_encode.
    """
    import jax

    if jax.default_backend() != "tpu":
        return "xla"
    if model_sharded:
        return "pallas_tp"
    if seq_len is not None and seq_len < 256:
        return "xla"
    return "pallas"


def _layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _attention_xla(q, k, v, mask_bias, num_heads: int):
    """Plain XLA attention: [B,S,H] -> [B,S,H]. mask_bias: [B,1,1,S] additive."""
    b, s, h = q.shape
    d = h // num_heads

    def split(x):
        return x.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)  # [B,N,S,D]

    qh, kh, vh = split(q), split(k), split(v)
    scores = jnp.einsum("bnqd,bnkd->bnqk", qh, kh, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(d, jnp.float32))
    scores = scores + mask_bias
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bnqk,bnkd->bnqd", probs, vh, preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(b, s, h).astype(q.dtype)


def _encoder_layer(x, mask_bias, lp, *, num_heads: int, eps: float,
                   attention_impl: str, use_fused_ffn: bool, tp_mesh=None):
    """One post-LN BERT layer. lp: this layer's slice of the stacked params."""
    dt = x.dtype
    q = jnp.dot(x, lp["q_w"].astype(dt), preferred_element_type=jnp.float32).astype(dt) + lp["q_b"].astype(dt)
    k = jnp.dot(x, lp["k_w"].astype(dt), preferred_element_type=jnp.float32).astype(dt) + lp["k_b"].astype(dt)
    v = jnp.dot(x, lp["v_w"].astype(dt), preferred_element_type=jnp.float32).astype(dt) + lp["v_b"].astype(dt)

    if attention_impl == "pallas":
        from financial_rag_tpu.ops.flash_attention import flash_attention

        attn = flash_attention(q, k, v, mask_bias, num_heads=num_heads)
    elif attention_impl == "pallas_tp":
        from financial_rag_tpu.ops.flash_attention import flash_attention_tp

        mesh, m_ax, d_ax = (tp_mesh if isinstance(tp_mesh, tuple)
                            else (tp_mesh, "model", "data"))
        attn = flash_attention_tp(q, k, v, mask_bias, num_heads=num_heads,
                                  mesh=mesh, model_axis=m_ax, data_axis=d_ax)
    else:
        attn = _attention_xla(q, k, v, mask_bias, num_heads)

    attn = jnp.dot(attn, lp["o_w"].astype(dt), preferred_element_type=jnp.float32).astype(dt) + lp["o_b"].astype(dt)
    x = _layer_norm(x + attn, lp["attn_ln_scale"], lp["attn_ln_bias"], eps)

    if use_fused_ffn:
        # fused dot->gelu->dot keeps the [.., intermediate] activation in
        # VMEM (the XLA path materializes ~200MB of it in HBM per layer)
        from financial_rag_tpu.ops.fused_ffn import fused_ffn

        h = fused_ffn(x, lp["ffn_in_w"], lp["ffn_in_b"],
                      lp["ffn_out_w"], lp["ffn_out_b"])
    else:
        h = jnp.dot(x, lp["ffn_in_w"].astype(dt), preferred_element_type=jnp.float32).astype(dt) + lp["ffn_in_b"].astype(dt)
        h = jax.nn.gelu(h, approximate=False)
        h = jnp.dot(h, lp["ffn_out_w"].astype(dt), preferred_element_type=jnp.float32).astype(dt) + lp["ffn_out_b"].astype(dt)
    x = _layer_norm(x + h, lp["ffn_ln_scale"], lp["ffn_ln_bias"], eps)
    return x


def bert_forward(
    params: BertParams,
    input_ids: jnp.ndarray,        # [B, S] int32
    attention_mask: jnp.ndarray,   # [B, S] int32/bool
    token_type_ids: Optional[jnp.ndarray] = None,
    *,
    config: ModelConfig,
    compute_dtype=jnp.float32,
    attention_impl: str = "xla",
    use_fused_ffn: Optional[bool] = None,
    tp_mesh=None,   # required for attention_impl="pallas_tp"
) -> jnp.ndarray:
    """Full encoder stack -> last hidden states [B, S, H]."""
    if use_fused_ffn is None:
        use_fused_ffn = attention_impl == "pallas"
    emb = params["embeddings"]
    b, s = input_ids.shape
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)

    x = (
        jnp.take(emb["word"], input_ids, axis=0)
        + emb["position"][:s][None, :, :]
        + jnp.take(emb["token_type"], token_type_ids, axis=0)
    )
    x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], config.layer_norm_eps)
    x = x.astype(compute_dtype)

    mask_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, NEG_INF).astype(jnp.float32)

    layer_fn = partial(
        _encoder_layer,
        num_heads=config.num_heads,
        eps=config.layer_norm_eps,
        attention_impl=attention_impl,
        use_fused_ffn=use_fused_ffn,
        tp_mesh=tp_mesh,
    )

    def scan_body(h, lp):
        return layer_fn(h, mask_bias, lp), None

    x, _ = jax.lax.scan(scan_body, x, params["layers"])
    return x


def pool_hidden(
    hidden: jnp.ndarray,           # [B, S, H]
    attention_mask: jnp.ndarray,   # [B, S]
    pooling: str,
    *,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Pool + L2-normalize -> [B, H] float32 unit vectors."""
    if pooling == "cls":
        pooled = hidden[:, 0, :].astype(jnp.float32)
        return pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)
    if pooling == "mean":
        if use_pallas:
            from financial_rag_tpu.ops.pool_norm import masked_mean_l2_normalize

            return masked_mean_l2_normalize(hidden, attention_mask)
        m = attention_mask.astype(jnp.float32)[:, :, None]
        summed = jnp.sum(hidden.astype(jnp.float32) * m, axis=1)
        counts = jnp.maximum(jnp.sum(m, axis=1), 1e-9)
        pooled = summed / counts
        return pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)
    raise ValueError(f"unknown pooling mode: {pooling}")


def bert_encode(
    params: BertParams,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    token_type_ids: Optional[jnp.ndarray] = None,
    *,
    config: ModelConfig,
    pooling: str = "mean",
    compute_dtype=jnp.float32,
    attention_impl: str = "xla",
    use_pallas_pool: bool = False,
    use_fused_ffn: Optional[bool] = None,
    tp_mesh=None,
) -> jnp.ndarray:
    """Sentence-embedding forward: encoder stack -> pool -> L2 norm. [B, H] f32."""
    hidden = bert_forward(
        params, input_ids, attention_mask, token_type_ids,
        config=config, compute_dtype=compute_dtype, attention_impl=attention_impl,
        use_fused_ffn=use_fused_ffn, tp_mesh=tp_mesh,
    )
    return pool_hidden(hidden, attention_mask, pooling, use_pallas=use_pallas_pool)


def cross_encoder_forward(
    params: BertParams,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    token_type_ids: jnp.ndarray,
    *,
    config: ModelConfig,
    compute_dtype=jnp.float32,
    attention_impl: str = "xla",
    use_fused_ffn: Optional[bool] = None,
) -> jnp.ndarray:
    """Sequence-classification forward (relevance logits [B]).

    Mirrors BertForSequenceClassification: encoder -> pooler(dense+tanh on
    CLS) -> classifier, identity activation (the MiniLM reranker's head,
    reference document_reranker.py:39-71 via sentence_transformers
    CrossEncoder).
    """
    hidden = bert_forward(
        params, input_ids, attention_mask, token_type_ids,
        config=config, compute_dtype=compute_dtype, attention_impl=attention_impl,
        use_fused_ffn=use_fused_ffn,
    )
    cls = hidden[:, 0, :].astype(jnp.float32)
    pooled = jnp.tanh(cls @ params["pooler"]["w"] + params["pooler"]["b"])
    logits = pooled @ params["classifier"]["w"] + params["classifier"]["b"]
    return logits[:, 0] if logits.ndim == 2 and logits.shape[-1] == 1 else logits


@dataclasses.dataclass(frozen=True)
class EncoderSpec:
    """Bundles a checkpoint's config with its pooling behavior."""

    config: ModelConfig
    pooling: str  # "cls" (bge) | "mean" (gte)

    @staticmethod
    def bge(config: ModelConfig) -> "EncoderSpec":
        return EncoderSpec(config=config, pooling="cls")

    @staticmethod
    def gte(config: ModelConfig) -> "EncoderSpec":
        return EncoderSpec(config=config, pooling="mean")
