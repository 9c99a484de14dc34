"""Fused masked mean-pool + L2-normalize Pallas kernel.

One VMEM pass over the encoder's last hidden states produces unit-norm
sentence embeddings, instead of three separate HBM-bound XLA ops
(mask-multiply+sum, divide, normalize). Replaces the capability of the
reference's per-text numpy pooling (reference local_embedder.py:171-191).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from financial_rag_tpu.ops.common import default_interpret, round_up


def _pool_norm_kernel(hidden_ref, mask_ref, out_ref):
    h = hidden_ref[:].astype(jnp.float32)              # [TB, S, H]
    m = mask_ref[:].astype(jnp.float32)                # [TB, S]
    summed = jnp.sum(h * m[:, :, None], axis=1)        # [TB, H]
    counts = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1e-9)
    pooled = summed / counts
    inv_norm = jax.lax.rsqrt(jnp.maximum(jnp.sum(pooled * pooled, axis=-1, keepdims=True), 1e-24))
    out_ref[:] = pooled * inv_norm


def masked_mean_l2_normalize(
    hidden: jnp.ndarray,          # [B, S, H]
    attention_mask: jnp.ndarray,  # [B, S]
    *,
    block_b: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Returns [B, H] float32 unit vectors."""
    if interpret is None:
        interpret = default_interpret()
    b, s, h = hidden.shape
    bp = round_up(max(b, 1), block_b)
    if bp != b:
        hidden = jnp.pad(hidden, ((0, bp - b), (0, 0), (0, 0)))
        attention_mask = jnp.pad(attention_mask, ((0, bp - b), (0, 0)), constant_values=1)

    out = pl.pallas_call(
        _pool_norm_kernel,
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, s, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, h), jnp.float32),
        interpret=interpret,
    )(hidden, attention_mask.astype(jnp.float32))
    return out[:b]
