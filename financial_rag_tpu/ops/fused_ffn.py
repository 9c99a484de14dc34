"""Fused FFN (dense -> gelu -> dense) Pallas kernel.

In the XLA encoder path the [B, S, intermediate] activation (e.g.
128x512x1536 bf16 = 201 MB) is materialized in HBM between the two FFN
matmuls and again around the gelu — profiled at ~2.3 ms/layer on v5e,
~40% of the whole encoder layer. This kernel streams token tiles through
VMEM: h = gelu(x @ W1 + b1) lives only on-chip before y = h @ W2 + b2,
so HBM traffic drops to the x/y tiles plus one pass over the weights.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from financial_rag_tpu.ops.common import default_interpret, round_up


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[:]
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    # tanh-approximate gelu: Mosaic has no erf/erfc lowering; max abs error
    # vs exact gelu is ~3e-4 on activations (immeasurable after pooling)
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b2_ref[:].astype(jnp.float32)
    out_ref[:] = y.astype(out_ref.dtype)


def fused_ffn(
    x: jnp.ndarray,    # [B, S, H] (or [N, H])
    w1: jnp.ndarray,   # [H, I]
    b1: jnp.ndarray,   # [I]
    w2: jnp.ndarray,   # [I, H]
    b2: jnp.ndarray,   # [H]
    *,
    block_t: int = 1024,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """gelu-MLP with the intermediate kept in VMEM. Returns x.dtype."""
    if interpret is None:
        interpret = default_interpret()
    orig_shape = x.shape
    h_dim = orig_shape[-1]
    i_dim = w1.shape[1]
    xt = x.reshape(-1, h_dim)
    n = xt.shape[0]
    np_ = round_up(max(n, 1), block_t)
    if np_ != n:
        xt = jnp.pad(xt, ((0, np_ - n), (0, 0)))

    dt = x.dtype
    out = pl.pallas_call(
        _ffn_kernel,
        grid=(np_ // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, h_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, i_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((i_dim, h_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, h_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, h_dim), dt),
        interpret=interpret,
    )(xt, w1.astype(dt), b1.reshape(1, -1).astype(dt), w2.astype(dt),
      b2.reshape(1, -1).astype(dt))
    return out[:n].reshape(orig_shape)
