#!/usr/bin/env python
"""Scale benchmark: the REAL index classes at 1M+ chunks on the real chip
(BASELINE configs[3-4] evidence; VERDICT r1 items 3 and weak-6).

Measures, over the same host-generated corpus:
  - FlatIndex (bf16, fused bucketed sweep) QPS at each scale,
  - FlatIndex (int8) QPS (half the HBM stream),
  - IVFIndex QPS at nprobe in {32, 64} + recall@10 vs the flat result,
validating the flat-vs-IVF crossover claim (index/ivf.py module docstring)
with numbers instead of prose.

Tunnel discipline (memory: axon quirks): the corpus uploads in 16k-row
pieces (~25MB each) — single >700MB transfers wedge the tunnel for ~30min.
Kernel timings are scan-chained slopes (fixed dispatch overhead cancels).

Usage: python scripts/bench_scale.py [--scales 262144 1048576] [--out BENCH_SCALE.json]
Writes one BENCH-style JSON line per config to --out and stdout.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

UPLOAD_ROWS = 16_384  # ~25MB f32 per piece


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def slope_time(jax, make_loop, iters_a, iters_b, reps=3):
    """Seconds/iteration as the slope between two scan lengths. The tunnel
    adds ~8ms RTT with multi-ms jitter per dispatch; taking the MIN of
    `reps` timings per length suppresses it (jitter is strictly additive).
    If the slope still comes out non-positive (work ≪ jitter), retry once
    with 8x the lengths so the device time dominates."""
    def measure(scale):
        t = {}
        for length in (iters_a * scale, iters_b * scale):
            loop = make_loop(length)
            _ = float(loop())  # compile + warm
            t[length] = min(
                _timed(loop) for _ in range(reps)
            )
        return (t[iters_b * scale] - t[iters_a * scale]) / ((iters_b - iters_a) * scale)

    dt = measure(1)
    if dt <= 0:
        log("slope non-positive (work below tunnel jitter); retrying with 8x lengths")
        dt = measure(8)
    return max(dt, 1e-9)


def _timed(loop):
    t0 = time.time()
    _ = float(loop())
    return time.time() - t0


def host_oracle_topk(q, x, ids, k, slice_rows=1_048_576):
    """Exact top-k ids by brute-force f32 matmul over corpus slices."""
    best_s = np.full((q.shape[0], k), -np.inf, np.float32)
    best_i = np.zeros((q.shape[0], k), np.int64)
    for lo in range(0, x.shape[0], slice_rows):
        s = q @ x[lo: lo + slice_rows].T
        cand_s = np.concatenate([best_s, s], axis=1)
        cand_i = np.concatenate(
            [best_i, np.broadcast_to(ids[lo: lo + slice_rows], (q.shape[0], s.shape[1]))],
            axis=1)
        part = np.argpartition(-cand_s, k - 1, axis=1)[:, :k]
        best_s = np.take_along_axis(cand_s, part, axis=1)
        best_i = np.take_along_axis(cand_i, part, axis=1)
    return best_i


def time_flat(jax, jnp, idx, q, iters=(20, 100)):
    """Scan-chained slope over the index's own compiled search fn."""
    idx.search(q[:1], 10)  # prime compile
    from financial_rag_tpu.ops.topk import bucketed_topk_fused, topk_matmul_reference

    xd, vd = idx._vectors, idx._valid
    qd = jnp.asarray(q)
    on_tpu = jax.default_backend() == "tpu"

    def raw(qq, x, v):
        if on_tpu:
            return bucketed_topk_fused(qq, x, v, 24, nbuckets=idx.nbuckets,
                                       interpret=False)
        return topk_matmul_reference(qq, x, v, 24)

    # corpus arrays ride as jit ARGUMENTS: closure capture would embed them
    # as HLO constants and blow the tunnel's compile-request size limit
    # (HTTP 413 at >=400MB)
    def make_loop(length):
        def body(q0, x, v):
            def chained(q_carry, _):
                s_, i_ = raw(q_carry, x, v)
                return q_carry + 0.0 * s_[0, 0], None
            return jax.lax.scan(chained, q0, None, length=length)[0]
        loop = jax.jit(body)
        return lambda: jnp.sum(loop(qd, xd, vd))

    return slope_time(jax, make_loop, *iters)


def time_ivf(jax, jnp, idx, q, nprobe, iters=(20, 100)):
    """Scan-chained slope over IVFIndex's compiled probe-search (16-query
    chunks, its serving shape)."""
    idx.search(q[:16], 10, nprobe=nprobe)  # prime + build fn
    run = idx._search_fns[(10, nprobe, idx.list_size)]
    qd = jnp.asarray(q[:16])
    storage, valid, cents = idx._storage, idx._valid, idx.centroids

    def make_loop(length):
        def body(q0, st, va, ce):
            def chained(q_carry, _):
                s_, li, sl = run(q_carry, st, va, ce)
                return q_carry + 0.0 * s_[0, 0], None
            return jax.lax.scan(chained, q0, None, length=length)[0]
        loop = jax.jit(body)
        return lambda: jnp.sum(loop(qd, storage, valid, cents))

    return slope_time(jax, make_loop, *iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", nargs="*", type=int, default=[262_144, 1_048_576])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nlist", type=int, default=0,
                    help="0 = auto (index.ivf.recommended_nlist per scale)")
    ap.add_argument("--out", default="BENCH_SCALE.json")
    ap.add_argument("--skip-ivf", action="store_true")
    ap.add_argument("--skip-flat", action="store_true")
    # bf16 at 10M needs ~8GB storage x2 during the upsert's copy-on-write
    # .at[].set — past a single v5e's 16GB HBM; int8-only fits (3.8GB x2)
    ap.add_argument("--dtypes", default="bf16,int8",
                    help="comma list from {bf16,int8}")
    # 10M bf16 IVF storage (nlist*list_size*384*2B with 2x list slack) is
    # ~16GB — past a v5e's HBM; int8 halves the probe stream AND fits
    ap.add_argument("--ivf-dtype", default="bf16", choices=["bf16", "int8"])
    args = ap.parse_args()

    import os

    import jax

    # FRAG_PLATFORM=cpu forces the CPU backend for smoke runs (the TPU
    # plugin force-registers itself and ignores a plain JAX_PLATFORMS)
    plat = os.environ.get("FRAG_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    from financial_rag_tpu.index.flat import FlatIndex
    from financial_rag_tpu.index.ivf import IVFIndex
    from financial_rag_tpu.models.encoder import setup_compilation_cache

    setup_compilation_cache()
    backend = jax.default_backend()
    log(f"backend={backend}")

    rng = np.random.default_rng(0)

    results = []
    for n in args.scales:
        log(f"=== scale {n} ===")
        # clustered corpus + in-distribution queries: shared generator
        # (financial_rag_tpu/utils/benchgen.py) — see its docstring for why
        # uniform corpora are invalid for ANN benchmarks and the noise-
        # scaling postmortem
        from financial_rag_tpu.utils.benchgen import clustered_corpus

        x, q = clustered_corpus(rng, n, 384, args.batch)
        ids = np.arange(1, n + 1, dtype=np.int64)

        all_configs = {"bf16": ("flat_bf16", dict(dtype=jnp.bfloat16)),
                       "int8": ("flat_int8", dict(dtype=jnp.int8))}
        configs = [all_configs[d.strip()] for d in args.dtypes.split(",") if d.strip()]
        flat_ids = None
        recall_ref = "flat_bf16"   # becomes f32_oracle when computed on host
        for name, kw in ([] if args.skip_flat else configs):
            idx = FlatIndex(dim=384, capacity=n, name=name, **kw)
            t0 = time.time()
            for lo in range(0, n, UPLOAD_ROWS):
                idx.upsert(ids[lo: lo + UPLOAD_ROWS], x[lo: lo + UPLOAD_ROWS])
            log(f"{name}: ingested {n} rows in {time.time()-t0:.1f}s (chunked)")
            dt = time_flat(jax, jnp, idx, q)
            qps = args.batch / dt
            got_ids, _ = idx.search(q, args.k)
            if name == "flat_bf16":
                flat_ids = got_ids
                rec = 1.0
            else:
                if flat_ids is None:
                    # int8-only run: exact f32 ground truth on host, in
                    # slices (a [B, N] score matrix at 10M won't fit)
                    log("computing host f32 oracle for recall reference...")
                    flat_ids = host_oracle_topk(q, x, ids, args.k)
                    recall_ref = "f32_oracle"
                rec = float(np.mean([len(set(a) & set(b)) / args.k
                                     for a, b in zip(got_ids, flat_ids)]))
            row = {"metric": f"{name} search QPS @ {n//1000}k chunks (k=24, batch={args.batch})",
                   "value": round(qps, 1), "unit": "qps", "corpus": "clustered",
                   "vs_baseline": round(qps / 50_000.0, 3),
                   "latency_ms_per_batch": round(dt * 1e3, 3),
                   f"recall@{args.k}": round(rec, 4), "recall_ref": recall_ref,
                   "n_chunks": n, "backend": backend}
            log(json.dumps(row))
            results.append(row)
            del idx

        if not args.skip_ivf:
            if flat_ids is None:
                log("computing host f32 oracle for recall reference...")
                flat_ids = host_oracle_topk(q, x, ids, args.k)
                recall_ref = "f32_oracle"
            from financial_rag_tpu.index.ivf import recommended_nlist

            nlist = args.nlist or recommended_nlist(n)
            ls = max((n // nlist) * 2, 256)
            ivf_dt = jnp.int8 if args.ivf_dtype == "int8" else jnp.bfloat16
            ivf_tag = "ivf_int8" if args.ivf_dtype == "int8" else "ivf"
            idx = IVFIndex(dim=384, nlist=nlist, list_size=ls, nprobe=64,
                           dtype=ivf_dt, name="ivf_scale")
            # enough sample mass per centroid for k-means quality (16x),
            # capped to keep the one-shot host->device transfer tunnel-safe
            n_sample = min(n, max(65_536, 16 * nlist), 393_216)
            sample = x[rng.choice(n, size=n_sample, replace=False)]
            t0 = time.time()
            idx.train(sample, iters=8, seed=0)
            log(f"ivf: trained {nlist} centroids on {n_sample//1000}k sample in {time.time()-t0:.1f}s")
            t0 = time.time()
            for lo in range(0, n, UPLOAD_ROWS):
                idx.upsert(ids[lo: lo + UPLOAD_ROWS], x[lo: lo + UPLOAD_ROWS])
            log(f"ivf: ingested {n} rows in {time.time()-t0:.1f}s")
            # auto-tune nprobe against the in-distribution query sample
            # (index/tuning.py), then measure at {tuned, 32, 64}
            report = idx.tune_nprobe(k=args.k, target_recall=0.95, queries=q)
            log(f"ivf: tuned nprobe={report['nprobe']} "
                f"(sweep={[(s['nprobe'], s['recall']) for s in report['sweep']]})")
            for nprobe in sorted({report["nprobe"], 32, 64}):
                dt = time_ivf(jax, jnp, idx, q, nprobe)
                qps = 16 / dt  # compiled fn serves 16-query chunks
                got_ids, _ = idx.search(q, args.k, nprobe=nprobe)
                rec = float(np.mean([len(set(a) & set(b)) / args.k
                                     for a, b in zip(got_ids, flat_ids)]))
                tuned = " TUNED" if nprobe == report["nprobe"] else ""
                row = {"metric": f"{ivf_tag} search QPS @ {n//1000}k chunks (nprobe={nprobe}{tuned}, nlist={nlist})",
                       "value": round(qps, 1), "unit": "qps", "corpus": "clustered",
                       "vs_baseline": round(qps / 50_000.0, 3),
                       "latency_ms_per_16q": round(dt * 1e3, 3),
                       f"recall@{args.k}": round(rec, 4), "recall_ref": recall_ref,
                       "n_chunks": n, "backend": backend}
                log(json.dumps(row))
                results.append(row)
            del idx

    Path(args.out).write_text("\n".join(json.dumps(r) for r in results) + "\n")
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
