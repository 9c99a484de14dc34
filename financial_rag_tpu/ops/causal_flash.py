"""Causal flash-attention forward for decoder PREFILL (Pallas, TPU).

The decoder's XLA prefill path (models/decoder.py::_attend) materializes the
full [B, KV, G, S, S] f32 score tensor in HBM — at the serving answer-prompt
bucket (S=4096, Qwen2-0.5B shape: 2 KV heads x 7 groups) that is ~940 MB of
scores PER LAYER, round-tripped ~3x (write scores, softmax read/write, PV
read) => ~80 ms of pure HBM traffic across 24 layers, dominating
time-to-first-token for on-device answer synthesis. This kernel runs the
blockwise online-softmax form instead: scores live only in VMEM tiles, so
attention HBM traffic drops to the q/k/v/out streams.

Layout follows ops/flash_attention.py: q/out ride as [B, S, Hq*D] and
k/v as [B, S, Hkv*D] so the LANE axis is the full hidden width (896 / 128 at
the 0.5B shape — multiples of 128), and heads unroll as STATIC slices inside
the kernel. Left padding is a per-row scalar (`pad_len`) rather than a mask
tensor: the serving prompts are contiguously left-padded, so key validity is
`key_pos >= pad_len` — no [S, S] mask ever exists. Causality is by padded
position index, matching the XLA path's `jnp.tril` exactly.

Inference-only (no VJP): prefill runs under no gradient. The tensor-parallel
generate path keeps the XLA attention (a Pallas call under plain GSPMD jit
would be replicated, silently defeating TP — see flash_attention_tp for the
shard_map treatment the ENCODER uses); single-device serving is where the
4096-token prompts live.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from financial_rag_tpu.ops.common import default_interpret

_NEG = -1e30   # python float: jnp scalars would be captured consts in the kernel


def _causal_kernel(pad_ref, q_ref, k_ref, v_ref, out_ref, *,
                   num_q_heads: int, num_kv_heads: int, head_dim: int,
                   block_k: int):
    """One (batch, q-tile) cell: all heads, online softmax over kv tiles.

    pad_ref: SMEM [1, 1] int32 — this row's left-pad length.
    q_ref/out_ref: VMEM [1, BQ, Hq*D]; k_ref/v_ref: VMEM [1, S, Hkv*D].
    Grid is (B, S/BQ) with the q-tile axis FASTEST, so the k/v blocks (whose
    index_map ignores the tile axis) stay resident across a batch row's
    tiles instead of re-streaming per tile.
    """
    i = pl.program_id(1)
    bq = q_ref.shape[1]
    s = k_ref.shape[1]
    group = num_q_heads // num_kv_heads
    scale = jnp.float32(1.0) / jnp.float32(head_dim) ** 0.5
    pad = pad_ref[0, 0]
    q0 = i * bq
    # kv tiles that intersect [0, q0 + bq): future tiles are fully masked
    # by causality — skip them entirely
    n_tiles = jnp.minimum((q0 + bq + block_k - 1) // block_k,
                          (s + block_k - 1) // block_k)

    q_pos = q0 + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)

    for h in range(num_q_heads):
        qh = q_ref[0, :, h * head_dim:(h + 1) * head_dim]          # [BQ, D]
        kv_lo = (h // group) * head_dim

        def body(j, carry):
            m, l, acc = carry
            k_tile = k_ref[0, pl.ds(j * block_k, block_k),
                           kv_lo:kv_lo + head_dim]                 # [BK, D]
            v_tile = v_ref[0, pl.ds(j * block_k, block_k),
                           kv_lo:kv_lo + head_dim]
            scores = jax.lax.dot_general(
                qh, k_tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale        # [BQ, BK]
            key_pos = j * block_k + col
            allow = (key_pos <= q_pos) & (key_pos >= pad)
            scores = jnp.where(allow, scores, _NEG)
            m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
            p = jnp.exp(scores - m_new)                            # [BQ, BK]
            alpha = jnp.exp(m - m_new)                             # [BQ, 1]
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_tile.dtype), v_tile, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)                # [BQ, D]
            return m_new, l_new, acc * alpha + pv

        m0 = jnp.full((bq, 1), _NEG, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        a0 = jnp.zeros((bq, head_dim), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_tiles, body, (m0, l0, a0))
        # fully-masked rows (inside the left padding) have l == 0; their
        # outputs are never read — emit 0 instead of NaN
        out = acc / jnp.maximum(l, 1e-30)
        out_ref[0, :, h * head_dim:(h + 1) * head_dim] = out.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("num_q_heads", "num_kv_heads",
                                   "block_q", "block_k", "interpret"))
def causal_flash_prefill(
    q: jnp.ndarray,         # [B, S, Hq*D]
    k: jnp.ndarray,         # [B, S, Hkv*D]
    v: jnp.ndarray,         # [B, S, Hkv*D]
    pad_len: jnp.ndarray,   # [B] int32 — left-pad length per row
    *,
    num_q_heads: int,
    num_kv_heads: int,
    block_q: int = 512,
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Causal (left-padded) GQA self-attention forward. Returns [B, S, Hq*D].

    Semantics match models/decoder.py::_attend under the prefill mask
    `tril(S) & (attention_mask == 1)` with attention_mask a contiguous
    left pad of `pad_len` zeros. Rows inside the padding return zeros
    (the XLA path returns uniform-softmax garbage there; neither is read).
    """
    if interpret is None:
        interpret = default_interpret()
    b, s, hq = q.shape
    head_dim = hq // num_q_heads
    bq = min(block_q, s)
    bk = min(block_k, s)
    assert s % bq == 0 and s % bk == 0, (s, bq, bk)
    grid = (b, s // bq)
    return pl.pallas_call(
        partial(_causal_kernel, num_q_heads=num_q_heads,
                num_kv_heads=num_kv_heads, head_dim=head_dim, block_k=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, qi: (bi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, hq), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, k.shape[2]), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, v.shape[2]), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hq), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, hq), q.dtype),
        interpret=interpret,
    )(pad_len.astype(jnp.int32).reshape(b, 1), q, k, v)
