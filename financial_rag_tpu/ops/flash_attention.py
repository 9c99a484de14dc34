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


def flash_attention(
    q: jnp.ndarray,            # [B, S, H]
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_bias: jnp.ndarray,    # [B, 1, 1, S] additive f32 (0 / -1e9)
    *,
    num_heads: int,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused multi-head self-attention. Returns [B, S, H] in q.dtype."""
    if interpret is None:
        interpret = default_interpret()
    b, s, h = q.shape
    head_dim = h // num_heads
    # bias as [B, 1, S]: the (1, S) trailing block dims equal the array's,
    # satisfying Mosaic's tile-alignment rule for non-(8,128) blocks
    bias = mask_bias.reshape(b, 1, s).astype(jnp.float32)

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
