"""Multivector (late-interaction) tier benchmark — VERDICT r3 #4.

Measures the exact-MaxSim index (index/multivector.py) at realistic scale
(20k children x 128 tokens x 384d bf16 ~= 2GB HBM) on three axes:

1. latency / QPS of the exact MaxSim sweep (slope-chained scan timing, the
   same discipline as bench.py — only host materialization fences on the
   tunneled backend), plus the achieved HBM bandwidth against the chip's
   streaming floor: the sweep reads the whole token block once per query,
   so bytes/dt vs ~800GB/s (v5e) decides whether a hand-written Pallas
   fusion could matter (PARITY.md defers that call to this profile);
2. ranking quality vs the DENSE mean-pooled ensemble on the same corpus:
   queries are 16-token subsets of one child's tokens (plus noise) — the
   late-interaction case where mean-pooling dilutes and MaxSim matches;
3. ranking quality of the REFERENCE's design on the same task: approximate
   MaxSim via per-query-token kNN with top-10 token neighbors only
   (reference parent_child/multivector_store.py:142-187), here simulated
   with EXACT per-token top-10 (an upper bound on its HNSW recall).

The token corpus is synthesized ON DEVICE (a ~2GB host upload through the
tunnel risks wedging it — memory: axon-tpu-tunnel-quirks).

Appends one JSON line to BENCH_MULTIVECTOR.json.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

plat = os.environ.get("FRAG_PLATFORM")
if plat:
    jax.config.update("jax_platforms", plat)

import jax.numpy as jnp
import numpy as np

from bench import log, slope_time
from financial_rag_tpu.index.flat import FlatIndex
from financial_rag_tpu.index.multivector import MultiVectorIndex
from financial_rag_tpu.models.encoder import setup_compilation_cache

HBM_FLOOR_GBPS = 819.0   # v5e HBM bandwidth (public spec)


def build_corpus(n, mct, d, n_concepts, seed, dtype):
    """Device-side clustered token corpus: child c's tokens are its
    concept's token anchors + noise. Returns (tokens [n, mct, d] dtype,
    concept_of [n] host)."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    anchors = jax.random.normal(k1, (n_concepts, mct, d), jnp.float32)
    anchors = anchors / jnp.linalg.norm(anchors, axis=-1, keepdims=True)
    concept_of = np.asarray(
        jax.random.randint(k2, (n,), 0, n_concepts))

    @jax.jit
    def make(anchors, concepts, noise_key):
        toks = anchors[concepts]                      # [n, mct, d]
        toks = toks + 0.35 * jax.random.normal(noise_key, toks.shape)
        toks = toks / jnp.linalg.norm(toks, axis=-1, keepdims=True)
        return toks.astype(dtype)

    tokens = make(anchors, jnp.asarray(concept_of), k3)
    return tokens, concept_of


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--children", type=int, default=20_480)
    ap.add_argument("--tokens", type=int, default=128)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--qtokens", type=int, default=16)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent
                                         / "BENCH_MULTIVECTOR.json"))
    args = ap.parse_args()

    setup_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"
    n, mct, d = args.children, args.tokens, args.dim
    if not on_tpu:
        n, mct = 1024, 32   # CPU smoke mode
    nq, tq, k = args.queries, args.qtokens, args.k
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    idx = MultiVectorIndex(dim=d, max_child_tokens=mct, capacity=n,
                           dtype=dtype, name="bench_mv")
    tokens, concept_of = build_corpus(idx.capacity, mct, d,
                                      n_concepts=256, seed=0, dtype=dtype)
    # install the device-synthesized corpus directly (a 2GB host round trip
    # through the tunnel is both pointless and wedge-prone); every child
    # uses all mct token slots
    idx._tokens = tokens
    idx._tok_mask = jnp.ones((idx.capacity, mct), jnp.float32
                             ).at[n:].set(0.0) if idx.capacity > n else \
        jnp.ones((idx.capacity, mct), jnp.float32)
    idx._valid = (jnp.ones((idx.capacity,), jnp.float32).at[n:].set(0.0)
                  if idx.capacity > n else jnp.ones((idx.capacity,), jnp.float32))
    idx._ids[:n] = np.arange(1, n + 1)
    idx._slot_of = {i + 1: i for i in range(n)}
    idx._next_slot = n

    # ---- queries: tq-token subsets of a target child's tokens + noise
    rng = np.random.default_rng(3)
    targets = rng.choice(n, size=nq, replace=False)
    sel = np.stack([rng.choice(mct, size=tq, replace=False) for _ in targets])
    q_tokens = np.asarray(tokens[jnp.asarray(targets)], np.float32)  # small pull
    q_tokens = np.take_along_axis(q_tokens, sel[:, :, None], axis=1)
    q_tokens = q_tokens + 0.25 * rng.standard_normal(q_tokens.shape).astype(np.float32)
    q_tokens /= np.maximum(np.linalg.norm(q_tokens, axis=2, keepdims=True), 1e-12)

    # ---- 1. exact MaxSim latency (slope-chained; storage rides as args)
    idx.search_aggregate(q_tokens[0], top_k=k)   # prime compile
    run = idx._search_fn[1]
    qd = jnp.asarray(q_tokens[0])
    toks, tmask, valid = idx._tokens, idx._tok_mask, idx._valid

    def make_loop(length):
        def body(q0, t, m, v):
            def chained(q_carry, _):
                s, i = run(q_carry, t, m, v)
                return q_carry + 0.0 * s[0], None
            return jax.lax.scan(chained, q0, None, length=length)[0]
        loop = jax.jit(body)
        return lambda: jnp.sum(loop(qd, toks, tmask, valid))

    iters = (20, 100) if on_tpu else (3, 9)
    dt = slope_time(make_loop, *iters).sec
    qps = 1.0 / dt
    bytes_per_query = idx.capacity * mct * d * (2 if dtype == jnp.bfloat16 else 4)
    gbps = bytes_per_query / dt / 1e9
    hbm_frac = gbps / HBM_FLOOR_GBPS if on_tpu else None
    log(f"maxsim: {dt * 1e3:.3f} ms/query @ {n} children x {mct} tokens "
        f"-> {qps:,.1f} QPS, {gbps:.0f} GB/s"
        + (f" ({hbm_frac:.0%} of HBM floor)" if on_tpu else ""))

    # ---- 2. exact MaxSim vs dense mean-pooled ensemble: hit@k of the
    # generating child
    @jax.jit
    def mean_pool(t, m):
        v = jnp.sum(t.astype(jnp.float32) * m[:, :, None], axis=1)
        v = v / jnp.maximum(m.sum(axis=1), 1.0)[:, None]
        return v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12)

    dense = FlatIndex(dim=d, capacity=idx.capacity, dtype=dtype, name="bench_mv_dense")
    dense.upsert(np.arange(1, n + 1, dtype=np.int64),
                 mean_pool(toks, tmask)[:n])
    q_dense = np.asarray(mean_pool(jnp.asarray(q_tokens),
                                   jnp.ones((nq, tq), jnp.float32)), np.float32)
    d_ids, _ = dense.search(q_dense, k)
    dense_hits = np.mean([(t + 1) in row.tolist()
                          for t, row in zip(targets, d_ids)])

    mv_hits = 0
    t0 = time.time()
    for qi in range(nq):
        hits = idx.search_aggregate(q_tokens[qi], top_k=k)
        if any(h["child_id"] == targets[qi] + 1 for h in hits):
            mv_hits += 1
    mv_hits /= nq
    e2e_ms = (time.time() - t0) / nq * 1e3
    log(f"hit@{k} of generating child: exact maxsim {mv_hits:.3f} "
        f"vs dense mean-pool {dense_hits:.3f} (e2e {e2e_ms:.1f} ms/query "
        f"incl host round trip)")

    # ---- 3. the reference's approximate design: per-query-token kNN,
    # top-10 token neighbors only, scores aggregated over retrieved pairs
    # (upper bound: exact top-10 instead of HNSW's approximate top-10)
    @jax.jit
    def ref_approx(qv, t, m, v):
        flat = t.reshape(-1, d).astype(jnp.float32)          # [n*mct, d]
        fm = (m.reshape(-1) * v.repeat(mct)) > 0
        sims = qv @ flat.T + jnp.where(fm, 0.0, -1e5)[None]  # [tq, n*mct]
        top_s, top_i = jax.lax.top_k(sims, 10)               # per token
        child = top_i // mct                                 # [tq, 10]
        # per query token, each child keeps its best retrieved sim; a child
        # never retrieved for that token contributes 0 (the approximation)
        contrib = jnp.zeros((qv.shape[0], t.shape[0]))
        contrib = contrib.at[jnp.arange(qv.shape[0])[:, None], child].max(top_s)
        return jax.lax.top_k(contrib.sum(axis=0), 10)

    ref_hits = 0
    for qi in range(nq):
        s, i = ref_approx(jnp.asarray(q_tokens[qi]), toks, tmask, valid)
        if (targets[qi]) in np.asarray(i).tolist():
            ref_hits += 1
    ref_hits /= nq
    log(f"hit@{k} reference-style approx (per-token top-10): {ref_hits:.3f}")

    row = {
        "metric": (f"exact MaxSim QPS @ {n} children x {mct} tokens "
                   f"({'bf16' if on_tpu else 'f32'}, {tq}-token queries)"),
        "value": round(qps, 1),
        "unit": "qps",
        "latency_ms_per_query": round(dt * 1e3, 3),
        "e2e_ms_per_query": round(e2e_ms, 1),
        "hbm_gbps": round(gbps, 1),
        "hbm_floor_fraction": round(hbm_frac, 3) if hbm_frac else None,
        "hit_at_k": {"k": k, "exact_maxsim": round(float(mv_hits), 4),
                     "dense_mean_pool": round(float(dense_hits), 4),
                     "reference_per_token_top10": round(float(ref_hits), 4)},
        "backend": jax.default_backend(),
        "n_children": n, "tokens_per_child": mct, "dim": d,
    }
    line = json.dumps(row)
    print(line)
    with open(args.out, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
