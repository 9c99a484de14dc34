"""Fused encoder self-attention Pallas kernel.

For the retrieval encoders the sequence is short (<=512, SURVEY.md §5.7), so
the whole [S, S] score matrix of one (batch, head) cell fits in VMEM. The
kernel therefore fuses QK^T -> bias -> softmax -> PV into a single VMEM
round-trip instead of materializing probabilities in HBM (the win over the
unfused XLA path). No ring/blockwise machinery is needed at this length —
that would be an extension for long-context encoders, not a port requirement.

head_dim is 32 (384 hidden / 12 heads); heads are looped inside one grid
cell over the full [S, H] block so lane tiling stays on the 384-wide hidden
axis rather than a 32-wide head axis.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from financial_rag_tpu.ops.common import default_interpret


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, num_heads: int, head_dim: int):
    """One batch element, all heads. refs: [1, S, H], bias: [1, 1, S] additive.

    Heads unroll as a static Python loop: Mosaic does not lower
    dynamic_slice, and static slices let the compiler schedule all head
    matmuls back-to-back on the MXU.
    """
    scale = 1.0 / (head_dim ** 0.5)
    bias = bias_ref[0, 0, :]                    # [S]
    qf = q_ref[0]                               # [S, H]
    kf = k_ref[0]
    vf = v_ref[0]

    for g in range(num_heads):
        lo = g * head_dim
        q = qf[:, lo: lo + head_dim]
        k = kf[:, lo: lo + head_dim]
        v = vf[:, lo: lo + head_dim]
        scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        scores = scores + bias[None, :]
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(vf.dtype), v, preferred_element_type=jnp.float32)
        out_ref[0, :, lo: lo + head_dim] = o.astype(out_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, *, num_heads: int, head_dim: int):
    """Backward for one batch element, all heads. Recomputes the softmax
    probabilities from VMEM-resident q/k/v (cheaper than round-tripping the
    [S, S] matrix through HBM at these lengths) and applies the standard
    attention gradient:
        dV = Pᵀ dO,  dP = dO Vᵀ,  dS = P ∘ (dP − rowsum(dP ∘ P)),
        dQ = dS K · scale,  dK = dSᵀ Q · scale.
    """
    scale = 1.0 / (head_dim ** 0.5)
    bias = bias_ref[0, 0, :]
    qf, kf, vf, dof = q_ref[0], k_ref[0], v_ref[0], do_ref[0]

    for g in range(num_heads):
        lo = g * head_dim
        q = qf[:, lo: lo + head_dim]
        k = kf[:, lo: lo + head_dim]
        v = vf[:, lo: lo + head_dim]
        do = dof[:, lo: lo + head_dim]
        scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        scores = scores + bias[None, :]
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)               # f32 [S, S]

        dv = jnp.dot(p.T.astype(dof.dtype), do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)  # [S, S]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jnp.dot(ds.astype(kf.dtype), k, preferred_element_type=jnp.float32) * scale
        dk = jnp.dot(ds.T.astype(qf.dtype), q, preferred_element_type=jnp.float32) * scale

        dq_ref[0, :, lo: lo + head_dim] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, lo: lo + head_dim] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, lo: lo + head_dim] = dv.astype(dv_ref.dtype)


def _fwd_call(q, k, v, bias, num_heads: int, interpret: bool):
    b, s, h = q.shape
    head_dim = h // num_heads
    return pl.pallas_call(
        partial(_attn_kernel, num_heads=num_heads, head_dim=head_dim),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, h), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_attention(q, k, v, bias, num_heads: int, interpret: bool):
    return _fwd_call(q, k, v, bias, num_heads, interpret)


def _flash_fwd(q, k, v, bias, num_heads: int, interpret: bool):
    out = _fwd_call(q, k, v, bias, num_heads, interpret)
    return out, (q, k, v, bias)


def _flash_bwd(num_heads: int, interpret: bool, res, dout):
    q, k, v, bias = res
    b, s, h = q.shape
    head_dim = h // num_heads
    spec = pl.BlockSpec((1, s, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        partial(_attn_bwd_kernel, num_heads=num_heads, head_dim=head_dim),
        grid=(b,),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                  spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((b, s, h), q.dtype),
                   jax.ShapeDtypeStruct((b, s, h), k.dtype),
                   jax.ShapeDtypeStruct((b, s, h), v.dtype)],
        interpret=interpret,
    )(q, k, v, bias, dout.astype(q.dtype))
    # bias is the (0 / -1e9) padding mask derived from integer input ids —
    # never a training target; a zero cotangent keeps the VJP total.
    return dq, dk, dv, jnp.zeros_like(bias)


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,            # [B, S, H]
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_bias: jnp.ndarray,    # [B, 1, 1, S] additive f32 (0 / -1e9)
    *,
    num_heads: int,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused multi-head self-attention. Returns [B, S, H] in q.dtype.

    Differentiable: a custom VJP recomputes probabilities in a second
    Pallas kernel, so training (training/contrastive.py) runs the fused
    path end-to-end instead of falling back to XLA attention.
    """
    if interpret is None:
        interpret = default_interpret()
    b, s, h = q.shape
    # bias as [B, 1, S]: the (1, S) trailing block dims equal the array's,
    # satisfying Mosaic's tile-alignment rule for non-(8,128) blocks
    bias = mask_bias.reshape(b, 1, s).astype(jnp.float32)
    return _flash_attention(q, k, v, bias, num_heads, interpret)


def flash_attention_tp(
    q: jnp.ndarray,            # [B, S, H] — H sharded over model_axis
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_bias: jnp.ndarray,    # [B, 1, 1, S] additive f32, replicated over model
    *,
    num_heads: int,
    mesh,
    model_axis: str = "model",
    data_axis: str = "data",
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused attention under tensor parallelism: shard_map-per-heads.

    Pallas custom calls carry no GSPMD partitioning rule, so under plain
    jit the SPMD partitioner would replicate the model-sharded q/k/v —
    silently defeating TP (the round-2 gap: TP training fell back to XLA
    attention, models/bert.resolve_attention_impl). Heads shard cleanly:
    each device runs the SAME kernel on its local num_heads/tp heads
    ([B_local, S, H/tp] blocks, head_dim unchanged), no collectives —
    attention is embarrassingly parallel over heads; the surrounding
    projections' all-reduces stay where GSPMD puts them. The custom VJP
    differentiates per-shard, so the fused backward also runs under TP.
    """
    tp = mesh.shape[model_axis]
    if num_heads % tp != 0:
        raise ValueError(f"num_heads={num_heads} not divisible by tp={tp}")
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    d = data_axis if data_axis in mesh.axis_names else None
    qkv_spec = P(d, None, model_axis)
    bias_spec = P(d, None, None, None)
    local_heads = num_heads // tp

    def local_attn(qq, kk, vv, bb):
        return flash_attention(qq, kk, vv, bb, num_heads=local_heads,
                               interpret=interpret)

    return shard_map(
        local_attn, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, bias_spec),
        out_specs=qkv_spec, check_vma=False,
    )(q, k, v, mask_bias)
