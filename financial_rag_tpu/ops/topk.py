"""Tiled cosine-similarity matmul with on-chip top-k — the index hot path.

This is the TPU-native replacement for the reference's hnswlib HNSW graph
walk inside ChromaDB (reference chroma_child_store.py:62-74): instead of a
pointer-chasing ANN graph (hostile to the MXU), the corpus is an HBM-resident
[N, D] matrix streamed tile-by-tile through one kernel that fuses

    scores tile  = Q @ X_tile^T          (MXU, bf16 in / f32 out)
    running top-k = select(scores tile ∪ running top-k)   (VPU)

so the [Bq, N] score matrix never exists in HBM. The kernel is
HBM-bandwidth-bound on the corpus stream; one sweep serves a whole query
block, which is what makes ≥50k QPS on a 100k-chunk index possible.

Exactness: every corpus tile's candidates are merged into the running top-k,
so results equal a full exact search. Ties break toward the lower corpus
index (same as np.argsort(-s, kind='stable'); verified in tests vs a numpy
oracle — SURVEY.md §7.3 'correctness at ties').
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from financial_rag_tpu.ops.common import default_interpret, round_up

NEG = -3.0e4  # below any cosine similarity; safe in bf16/f32

INT8_SCALE = 127.0  # int8 level count; actual scales are per-vector/per-query max-abs


def _tile_scores(q, x):
    """Raw similarity of a query block against a corpus tile.

    bf16/f32 corpus: bf16-in/f32-out MXU dot (already in cosine range).
    int8 corpus (and int8-quantized queries): exact int8xint8->int32 MXU
    dot — halves the HBM stream. Dequantization happens OUTSIDE this dot:
    the kernel multiplies by the per-corpus-row weight carried in the
    validity array (see persist.encode_payload) and the wrapper multiplies
    by the per-query scale from quantize_queries, restoring cosine range.
    """
    if x.dtype == jnp.int8:
        s = jnp.dot(q, x.T, preferred_element_type=jnp.int32)
        return s.astype(jnp.float32)
    return jnp.dot(q, x.T, preferred_element_type=jnp.float32)


def _weighted_mask(scores, w):
    """scores * per-row weight, with empty slots (w == 0) pushed below any
    real score. Float corpora carry weight 1.0 for live slots, so this is
    the plain validity mask there; int8 corpora carry max|v|/127, which
    dequantizes the integer dot on the fly."""
    live = (w > 0.0).astype(jnp.float32)
    return scores * w + (live - 1.0) * 1.0e5


def quantize_queries(queries: jnp.ndarray, corpus_dtype):
    """Match query dtype to the corpus. Returns (queries, qscale) where
    qscale is a per-query [Bq, 1] f32 factor restoring score calibration
    (None for float corpora). int8 quantizes per query by max-abs, with
    rounding (not truncation); top-k ranking is invariant to the positive
    per-query factor, so it multiplies the scores after the kernel."""
    if corpus_dtype == jnp.int8:
        m = jnp.maximum(jnp.max(jnp.abs(queries), axis=1, keepdims=True), 1e-12)
        q = jnp.clip(jnp.round(queries * (INT8_SCALE / m)), -127, 127).astype(jnp.int8)
        return q, (m / INT8_SCALE).astype(jnp.float32)
    return queries.astype(corpus_dtype), None


def _merge_topk(cand_scores, cand_idx, k: int):
    """Exact top-k of each row of cand_scores via k-step extraction.

    cand_scores: [B, W] f32, cand_idx: [B, W] i32. Returns ([B, K], [B, K])
    where K = padded k width (kpad); only the first k columns are meaningful.
    Ties select the smallest candidate position (stable).
    """
    b, w = cand_scores.shape
    kpad = round_up(k, 128)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (b, kpad), 1)

    def body(i, carry):
        cand, top_s, top_i = carry
        m = jnp.max(cand, axis=1, keepdims=True)                      # [B,1]
        at_max = cand == m
        pos = jnp.min(jnp.where(at_max, col, w), axis=1, keepdims=True)  # first max
        onehot = col == pos                                           # [B,W]
        idx = jnp.sum(jnp.where(onehot, cand_idx, 0), axis=1, keepdims=True)
        slot = out_col == i
        top_s = jnp.where(slot, m, top_s)
        top_i = jnp.where(slot, idx, top_i)
        cand = jnp.where(onehot, NEG, cand)
        return cand, top_s, top_i

    top_s = jnp.full((b, kpad), NEG, jnp.float32)
    top_i = jnp.full((b, kpad), -1, jnp.int32)
    _, top_s, top_i = jax.lax.fori_loop(
        0, k, body, (cand_scores.astype(jnp.float32), top_s, top_i))
    return top_s, top_i


def _topk_kernel(q_ref, x_ref, valid_ref, out_s_ref, out_i_ref, *, k: int, block_n: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG)
        out_i_ref[:] = jnp.full_like(out_i_ref, -1)

    scores = _weighted_mask(_tile_scores(q_ref[:], x_ref[:]), valid_ref[:])  # [Bq, T]

    bq, t = scores.shape
    local = jax.lax.broadcasted_iota(jnp.int32, (bq, t), 1) + j * block_n
    # running top-k first: on score ties the earlier (lower-index) entry wins
    cand_s = jnp.concatenate([out_s_ref[:], scores], axis=1)
    cand_i = jnp.concatenate([out_i_ref[:], local], axis=1)
    top_s, top_i = _merge_topk(cand_s, cand_i, k)
    out_s_ref[:] = top_s
    out_i_ref[:] = top_i


def topk_matmul(
    queries: jnp.ndarray,   # [Bq, D] (any float dtype; L2-normalized for cosine)
    corpus: jnp.ndarray,    # [N, D]  (bf16 recommended; N multiple of block_n)
    valid: jnp.ndarray,     # [N] 1.0 for live slots, 0.0 for empty
    k: int,
    *,
    block_q: int = 64,
    block_n: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k cosine search. Returns (scores [Bq, k] f32, idx [Bq, k] i32)."""
    if interpret is None:
        interpret = default_interpret()
    bq, d = queries.shape
    n = corpus.shape[0]
    assert n % block_n == 0, f"corpus rows {n} must be a multiple of block_n {block_n}"
    kpad = round_up(k, 128)

    bqp = round_up(max(bq, 1), block_q)
    if bqp != bq:
        queries = jnp.pad(queries, ((0, bqp - bq), (0, 0)))

    grid = (bqp // block_q, n // block_n)
    qq, qscale = quantize_queries(queries, corpus.dtype)

    out_s, out_i = pl.pallas_call(
        partial(_topk_kernel, k=k, block_n=block_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_q, kpad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, kpad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bqp, kpad), jnp.float32),
            jax.ShapeDtypeStruct((bqp, kpad), jnp.int32),
        ),
        interpret=interpret,
    )(qq, corpus, valid.reshape(1, n).astype(jnp.float32))
    if qscale is not None:
        # rescale only live raw scores; masked/unfilled sentinels (<= NEG)
        # must stay below the downstream validity threshold
        qs = qscale[:out_s.shape[0]]
        out_s = jnp.where(out_s > NEG, out_s * qs, NEG)
    return out_s[:bq, :k], out_i[:bq, :k]


def _bucketed_kernel(q_ref, x_ref, valid_ref, out_s_ref, out_i_ref, *, block_n: int, nbuckets: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG)
        out_i_ref[:] = jnp.full_like(out_i_ref, -1)

    scores = _weighted_mask(_tile_scores(q_ref[:], x_ref[:]), valid_ref[:])  # [Bq, T]

    bq, t = scores.shape
    local = jax.lax.broadcasted_iota(jnp.int32, (bq, t), 1) + j * block_n
    off = pl.multiple_of(jax.lax.rem(j * block_n, nbuckets), block_n)
    seg_s = out_s_ref[:, pl.ds(off, t)]
    seg_i = out_i_ref[:, pl.ds(off, t)]
    better = scores > seg_s  # strict: ties keep the earlier (lower) corpus index
    out_s_ref[:, pl.ds(off, t)] = jnp.where(better, scores, seg_s)
    out_i_ref[:, pl.ds(off, t)] = jnp.where(better, local, seg_i)


def _bucketed_fused_kernel(q_ref, x_ref, valid_ref, out_s_ref, out_i_ref,
                           bs_ref, bi_ref, *, k: int, block_n: int, nphases: int):
    """Bucketed running max with the final k-extraction fused into the last
    grid step, so only [Bq, kpad] leaves the kernel.

    Bucket buffers live in VMEM scratch shaped [nphases, Bq, block_n]: tile
    j updates phase j % nphases via a LEADING-dim dynamic index (cheap),
    never a dynamic lane-offset slice (which lowers to slow unaligned
    vector shuffles).
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        bs_ref[:] = jnp.full_like(bs_ref, NEG)
        bi_ref[:] = jnp.full_like(bi_ref, -1)

    scores = _weighted_mask(_tile_scores(q_ref[:], x_ref[:]), valid_ref[:])
    bq, t = scores.shape
    local = jax.lax.broadcasted_iota(jnp.int32, (bq, t), 1) + j * block_n
    phase = jax.lax.rem(j, nphases)
    seg_s = bs_ref[phase]
    seg_i = bi_ref[phase]
    better = scores > seg_s
    bs_ref[phase] = jnp.where(better, scores, seg_s)
    bi_ref[phase] = jnp.where(better, local, seg_i)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        cand_s = jnp.concatenate([bs_ref[p] for p in range(nphases)], axis=1)
        cand_i = jnp.concatenate([bi_ref[p] for p in range(nphases)], axis=1)
        top_s, top_i = _merge_topk(cand_s, cand_i, k)
        out_s_ref[:] = top_s
        out_i_ref[:] = top_i


def bucketed_topk_fused(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    *,
    nbuckets: int = 4096,
    block_q: int = 128,
    block_n: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """bucketed_topk with the final merge fused into the kernel (returns
    [Bq, k] directly; avoids the [Bq, nbuckets] HBM roundtrip and the XLA
    sort in lax.top_k)."""
    if interpret is None:
        interpret = default_interpret()
    bq, d = queries.shape
    n = corpus.shape[0]
    assert n % block_n == 0, f"corpus rows {n} must be a multiple of block_n {block_n}"
    if n < nbuckets:
        nbuckets = n
    assert nbuckets % block_n == 0
    kpad = round_up(k, 128)

    bqp = round_up(max(bq, 1), block_q)
    if bqp != bq:
        queries = jnp.pad(queries, ((0, bqp - bq), (0, 0)))
    grid = (bqp // block_q, n // block_n)
    qq, qscale = quantize_queries(queries, corpus.dtype)

    nphases = nbuckets // block_n
    out_s, out_i = pl.pallas_call(
        partial(_bucketed_fused_kernel, k=k, block_n=block_n, nphases=nphases),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_q, kpad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, kpad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bqp, kpad), jnp.float32),
            jax.ShapeDtypeStruct((bqp, kpad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nphases, block_q, block_n), jnp.float32),
            pltpu.VMEM((nphases, block_q, block_n), jnp.int32),
        ],
        interpret=interpret,
    )(qq, corpus, valid.reshape(1, n).astype(jnp.float32))
    if qscale is not None:
        # rescale only live raw scores; masked/unfilled sentinels (<= NEG)
        # must stay below the downstream validity threshold
        qs = qscale[:out_s.shape[0]]
        out_s = jnp.where(out_s > NEG, out_s * qs, NEG)
    return out_s[:bq, :k], out_i[:bq, :k]


def _packed_kernel(q_ref, x_ref, valid_ref, bias_ref, out_s_ref, out_i_ref,
                   *scratch, k: int, block_n: int, bits: int, maxj: int,
                   per_bucket: int):
    """See packed_topk_fused. Per tile (the hot loop, ~5 VPU passes):

        s  = Q @ X_tile^T                    (MXU)
        p  = s * valid + bias                (one fma; live: s+2 in
                                              (0.99, 3.01]; dead: exactly
                                              -2 regardless of |s|)
        pb = bits(p) & ~MASK | (maxj - j)    (tile id in the low mantissa
                                              bits; positive floats are
                                              bit-monotone, negatives keep
                                              the sign bit -> lose to the
                                              0 init under signed int max)
        b1 = max(b1, pb)                     (ONE int32 max, ONE buffer)
        [per_bucket=2: b2 = max(b2, min(b1_old, pb)) — the runner-up]

    No per-tile iota, no compare+dual-select, no phase-indexed scratch —
    each of those measured 20-50us/sweep on v5e (KERNELS.md roofline)."""
    j = pl.program_id(1)
    mask = (1 << bits) - 1

    @pl.when(j == 0)
    def _():
        for ref in scratch:
            ref[:] = jnp.zeros_like(ref)

    s = jax.lax.dot_general(q_ref[:], x_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = s * valid_ref[:] + bias_ref[:]
    pb = jax.lax.bitcast_convert_type(p, jnp.int32)
    pb = (pb & ~mask) | (maxj - j)           # later tile -> smaller low bits
    if per_bucket == 2:
        b1 = scratch[0][:]
        scratch[0][:] = jnp.maximum(b1, pb)
        scratch[1][:] = jnp.maximum(scratch[1][:], jnp.minimum(b1, pb))
    else:
        scratch[0][:] = jnp.maximum(scratch[0][:], pb)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        packed = (jnp.concatenate([r[:] for r in scratch], axis=1)
                  if per_bucket == 2 else scratch[0][:])
        bq, nb = packed.shape
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, nb), 1)
        t = jax.lax.rem(col, block_n)
        gidx = (maxj - (packed & mask)) * block_n + t
        ps = jax.lax.bitcast_convert_type(packed, jnp.float32)
        live = packed > 0                    # 0 init / negative = dead
        ps = jnp.where(live, ps, NEG)
        top_p, top_i = _merge_topk(ps, jnp.where(live, gidx, -1), k)
        sb = jax.lax.bitcast_convert_type(top_p, jnp.int32) & ~mask
        sc = jax.lax.bitcast_convert_type(sb, jnp.float32) - 2.0
        empty = top_p <= NEG
        out_s_ref[:] = jnp.where(empty, NEG, sc)
        out_i_ref[:] = jnp.where(empty, -1, top_i)


def packed_topk_fused(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    *,
    block_q: int = 128,
    block_n: int = 1024,
    per_bucket: int = 2,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The serving sweep kernel: bucketed top-k with score+tile-id PACKED
    into one f32 word so the per-tile update is a single int32 max on a
    single fixed scratch buffer.

    Profiled on v5e (KERNELS.md): the fused-bucket family is bound by the
    per-tile critical path MXU-dot -> VPU bucket update, and every extra
    elementwise pass over the [128, 1024] tile costs ~5us/sweep; the
    shipped bucketed_topk_fused spends ~10 passes plus a phase-indexed
    scratch (+30us) for 164us/sweep @ 102k chunks. This kernel packs the
    candidate (score, tile) into the f32 bit pattern — positive IEEE floats
    compare correctly as signed ints — cutting the update to ~5 passes and
    ONE buffer: 129us/sweep measured (74% of HBM spec; the DMA-only
    ceiling of this pipeline measures 85-92%, so ~85% of achievable).

    per_bucket=2 keeps the best AND second-best candidate per bucket
    (classic top-2 running max), so a bucket collision among the true
    top-k needs THREE hits to lose one: recall@24 on the 102k benchmark
    is 0.9941 vs 0.9909 for the 4096-bucket single-candidate kernel, at
    141us/sweep. per_bucket=1 is the speed point (129us, recall 0.9827).

    Scores are quantized by `bits = ceil(log2(ntiles))` low mantissa bits
    (quantum <= 2^-14 in cosine units at 10M chunks) and ties within a
    quantum resolve toward the earlier tile = lower corpus index. Float
    corpora only (bf16/f32); int8 corpora need the per-row dequant weight
    inside the dot — they route to bucketed_topk_fused (FlatIndex._dispatch).

    Same exactness property as bucketed_topk when the corpus fits the
    buckets: N <= block_n (per_bucket=1) means every column is its own
    bucket, so results equal the exact kernel up to score quantization.
    """
    assert corpus.dtype != jnp.int8, \
        "packed_topk_fused is the float-corpus path; int8 uses bucketed_topk_fused"
    if interpret is None:
        interpret = default_interpret()
    bq, d = queries.shape
    n = corpus.shape[0]
    block_n = min(block_n, n)
    assert n % block_n == 0, f"corpus rows {n} must be a multiple of block_n {block_n}"
    ntiles = n // block_n
    bits = max(int(np.ceil(np.log2(ntiles))), 1) if ntiles > 1 else 1
    kpad = round_up(k, 128)
    per_bucket = 2 if per_bucket == 2 else 1

    bqp = round_up(max(bq, 1), block_q)
    if bqp != bq:
        queries = jnp.pad(queries, ((0, bqp - bq), (0, 0)))
    grid = (bqp // block_q, ntiles)

    live = valid.reshape(1, n) > 0.0
    vrow = live.astype(jnp.float32)
    bias = jnp.where(live, 2.0, -2.0).astype(jnp.float32)
    out_s, out_i = pl.pallas_call(
        partial(_packed_kernel, k=k, block_n=block_n, bits=bits,
                maxj=ntiles - 1, per_bucket=per_bucket),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_q, kpad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, kpad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bqp, kpad), jnp.float32),
            jax.ShapeDtypeStruct((bqp, kpad), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((block_q, block_n), jnp.int32)
                        for _ in range(per_bucket)],
        interpret=interpret,
    )(queries.astype(corpus.dtype), corpus, vrow, bias)
    return out_s[:bq, :k], out_i[:bq, :k]


def bucketed_topk(
    queries: jnp.ndarray,   # [Bq, D]
    corpus: jnp.ndarray,    # [N, D]; N multiple of block_n
    valid: jnp.ndarray,     # [N]
    k: int,
    *,
    nbuckets: int = 4096,
    block_q: int = 128,
    block_n: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fast near-exact top-k: fused matmul + per-bucket running max.

    Corpus column j competes only within bucket j % nbuckets, so each tile
    costs ~3 VPU passes (compare/select) instead of a k-step extraction —
    the kernel runs at HBM speed-of-light on the corpus stream. A final
    exact lax.top_k over the [Bq, nbuckets] bucket maxima yields the
    result. Expected recall ≈ 1 - k(k-1)/(2·nbuckets) (two of the true
    top-k colliding in one bucket loses the worse one): 0.997 for k=24,
    nbuckets=4096. When N <= nbuckets the search is exact.

    Same role as XLA's approx_max_k but fused with the similarity matmul so
    the [Bq, N] score matrix never touches HBM.
    """
    if interpret is None:
        interpret = default_interpret()
    bq, d = queries.shape
    n = corpus.shape[0]
    assert n % block_n == 0, f"corpus rows {n} must be a multiple of block_n {block_n}"
    if n < nbuckets:
        nbuckets = n
    assert nbuckets % block_n == 0, "nbuckets must be a multiple of block_n"

    bqp = round_up(max(bq, 1), block_q)
    if bqp != bq:
        queries = jnp.pad(queries, ((0, bqp - bq), (0, 0)))
    grid = (bqp // block_q, n // block_n)
    qq, qscale = quantize_queries(queries, corpus.dtype)

    bucket_s, bucket_i = pl.pallas_call(
        partial(_bucketed_kernel, block_n=block_n, nbuckets=nbuckets),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_q, nbuckets), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, nbuckets), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bqp, nbuckets), jnp.float32),
            jax.ShapeDtypeStruct((bqp, nbuckets), jnp.int32),
        ),
        interpret=interpret,
    )(qq, corpus, valid.reshape(1, n).astype(jnp.float32))

    top_s, pos = jax.lax.top_k(bucket_s[:bq], k)
    top_i = jnp.take_along_axis(bucket_i[:bq], pos, axis=1)
    if qscale is not None:
        top_s = jnp.where(top_s > NEG, top_s * qscale[:bq], NEG)
    return top_s, top_i


def topk_matmul_reference(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    *,
    chunk: int = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-XLA exact top-k (lax.scan over corpus chunks + lax.top_k merge).

    Used as the CPU/test oracle path and as a fallback index backend. Same
    tie semantics as the Pallas kernel (lower index wins): lax.top_k is
    stable, and the chunked merge keys ties by chunk order.
    """
    bq, d = queries.shape
    n = corpus.shape[0]
    chunk = min(chunk, n)
    assert n % chunk == 0, f"corpus rows {n} must be a multiple of chunk {chunk}"
    q, qscale = quantize_queries(queries, corpus.dtype)
    num_chunks = n // chunk

    corpus_r = corpus.reshape(num_chunks, chunk, d)
    valid_r = valid.reshape(num_chunks, chunk).astype(jnp.float32)

    def step(carry, inp):
        run_s, run_i = carry
        x, v, j = inp
        s = _weighted_mask(_tile_scores(q, x), v[None, :])
        idx = jnp.arange(chunk, dtype=jnp.int32)[None, :] + j * chunk
        cand_s = jnp.concatenate([run_s, s], axis=1)
        cand_i = jnp.concatenate([run_i, jnp.broadcast_to(idx, (bq, chunk))], axis=1)
        # stable top_k over scores; ties: earlier position == lower corpus idx
        top_s, pos = jax.lax.top_k(cand_s, k)
        top_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return (top_s, top_i), None

    init = (jnp.full((bq, k), NEG, jnp.float32), jnp.full((bq, k), -1, jnp.int32))
    js = jnp.arange(num_chunks, dtype=jnp.int32)
    (out_s, out_i), _ = jax.lax.scan(step, init, (corpus_r, valid_r, js))
    if qscale is not None:
        out_s = jnp.where(out_s > NEG, out_s * qscale, NEG)
    return out_s, out_i
