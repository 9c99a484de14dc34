"""Fused IVF probe gather+score kernel.

The IVF hot path must read, for every query, the `nprobe` posting-list
tiles its centroid top-k selected — a data-dependent gather of large
contiguous [L, D] blocks out of the [nlist, L, D] grouped storage. XLA
lowers `jnp.take(storage, probe_col, axis=0)` to a generic dynamic-gather
that runs two orders of magnitude below HBM bandwidth on TPU (measured
~5 GB/s effective at 1M chunks — 160 ms for 16 queries x 32 probes).

The Pallas shape of this problem is scalar prefetch: the probe indices are
a scalar-prefetch argument, available *before* the kernel body runs, so
the BlockSpec index_map of the storage input is simply

    lambda b, p, probes: (probes[b, p], 0, 0)

and the Mosaic pipeline turns the whole search into a sequence of plain
contiguous [L, D] HBM->VMEM DMAs, double-buffered against the score
matmul. The same probed-tile mechanism serves the weights row (validity /
per-row dequantization scale, ops/topk._weighted_mask convention), so
int8 storage works exactly as in the flat index: raw int8xint8 MXU dot,
dequantized by the per-row weight in-kernel and the per-query scale in
the wrapper.

Replaces the capability of the reference's pgvector IVFFlat probe scan
(reference pgvector_child_store.py:92-98) at TPU memory speed-of-light.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from financial_rag_tpu.ops.common import default_interpret
from financial_rag_tpu.ops.topk import _tile_scores, _weighted_mask


def _probe_kernel(probes_ref, q_ref, x_ref, w_ref, out_ref):
    del probes_ref  # consumed by the index_maps
    i = pl.program_id(0)
    j = pl.program_id(1)

    # Mosaic cannot prove sublane alignment of data-dependent row slices
    # (q_ref[pl.ds(i, 1)] fails to compile natively), so the dynamic row
    # select/scatter are done arithmetically: mask + sum picks query row i
    # (exact — a single non-zero row), mask + merge scatters the scores
    # into probe row j of the revisited output block.
    b = q_ref.shape[0]
    msk = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0) == i
    if q_ref.dtype == jnp.int8:
        q = jnp.sum(jnp.where(msk, q_ref[:].astype(jnp.int32), 0),
                    axis=0, keepdims=True).astype(jnp.int8)
    else:
        q = jnp.sum(jnp.where(msk, q_ref[:], jnp.zeros_like(q_ref)).astype(jnp.float32),
                    axis=0, keepdims=True).astype(q_ref.dtype)

    s = _weighted_mask(_tile_scores(q, x_ref[0]), w_ref[0])   # [1, L]

    p, ls = out_ref.shape[1], out_ref.shape[2]
    hit = jax.lax.broadcasted_iota(jnp.int32, (p, ls), 0) == j
    s_b = jnp.broadcast_to(s, (p, ls))

    @pl.when(j == 0)
    def _():
        out_ref[0] = jnp.where(hit, s_b, -1.0e5)

    @pl.when(j > 0)
    def _():
        out_ref[0] = jnp.where(hit, s_b, out_ref[0])


def probe_scores(
    queries: jnp.ndarray,    # [B, D], dtype matched to storage by the caller
    storage: jnp.ndarray,    # [nlist, L, D] bf16/f32/int8 grouped posting lists
    weights: jnp.ndarray,    # [nlist, L] f32; 0 = empty slot, else dequant weight
    probes: jnp.ndarray,     # [B, P] int32 list ids per query
    *,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Masked similarity of each query against its probed tiles.

    Returns scores [B, P, L] f32: raw-dot x per-row weight for live slots,
    ~-1e5 for empty slots (below ops/topk.NEG, filtered downstream). The
    caller applies the per-query int8 scale (ops/topk.quantize_queries).
    """
    if interpret is None:
        interpret = default_interpret()
    b, d = queries.shape
    nlist, list_size, _ = storage.shape
    p = probes.shape[1]

    # The whole (1, P, L) out block must fit in VMEM (double-buffered by
    # the pipeline). Large-P calls (exhaustive tuning probes all nlist
    # lists) are split along the probe axis; each slice re-reads only the
    # tiny query block, so the tile stream cost is unchanged.
    p_max = max(1, (2 * 1024 * 1024) // (4 * list_size))
    if p > p_max:
        return jnp.concatenate(
            [probe_scores(queries, storage, weights, probes[:, i: i + p_max],
                          interpret=interpret)
             for i in range(0, p, p_max)], axis=1)

    # Mosaic block constraint: the last two dims of a block must be
    # (8, 128)-divisible or equal the array's. Hence: queries ride whole
    # (the kernel row-slices by program_id), weights gain a middle axis so
    # their L lands in the lane dim, and the out block covers all P probe
    # rows of one query — consecutive p steps revisit the same block, so
    # Mosaic keeps it in VMEM and flushes it once per query.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, p),
        in_specs=[
            pl.BlockSpec((b, d), lambda i, j, pr: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, list_size, d), lambda i, j, pr: (pr[i, j], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, list_size), lambda i, j, pr: (pr[i, j], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p, list_size), lambda i, j, pr: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _probe_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, p, list_size), jnp.float32),
        interpret=interpret,
    )(probes.astype(jnp.int32), queries, storage,
      weights.astype(jnp.float32).reshape(nlist, 1, list_size))


def probe_scores_reference(
    queries: jnp.ndarray,
    storage: jnp.ndarray,
    weights: jnp.ndarray,
    probes: jnp.ndarray,
) -> jnp.ndarray:
    """Pure-XLA probe scoring (scan over probes, gather + batched dot).

    Semantics identical to :func:`probe_scores`; used as the CPU / test
    path — interpret-mode Pallas executes the (B x P) grid step-by-step in
    Python, far too slow for CPU serving, while this compiles to one XLA
    program. On TPU the gather lowering is ~100x off HBM bandwidth, which
    is exactly why the Pallas kernel exists.
    """
    def probe_step(_, probe_col):                       # probe_col [B]
        tile = jnp.take(storage, probe_col, axis=0)     # [B, L, D]
        w = jnp.take(weights, probe_col, axis=0)        # [B, L]
        if storage.dtype == jnp.int8:
            s = jnp.einsum("bd,bld->bl", queries.astype(jnp.int32),
                           tile.astype(jnp.int32),
                           preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            s = jnp.einsum("bd,bld->bl", queries, tile,
                           preferred_element_type=jnp.float32)
        live = (w > 0.0).astype(jnp.float32)
        return 0, s * w + (live - 1.0) * 1.0e5
    _, scores = jax.lax.scan(probe_step, 0, probes.astype(jnp.int32).T)  # [P, B, L]
    return scores.transpose(1, 0, 2)
