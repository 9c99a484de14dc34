#!/usr/bin/env python
"""Benchmark suite: QPS + recall across index backends and corpus scales
(BASELINE.md configs 3-4 evidence). Prints a JSON line per config.

Usage: python scripts/bench_suite.py [--scales 102400 1048576] [--batch 128]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def recall_vs_oracle(got_idx, q, x, k, sample):
    sref = q[:sample] @ x.T
    order = np.argsort(-sref, axis=1, kind="stable")[:, :k]
    return float(np.mean([len(set(a) & set(b)) / k
                          for a, b in zip(got_idx[:sample], order)]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", nargs="*", type=int, default=[102_400, 1_048_576])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--oracle-sample", type=int, default=16)
    args = ap.parse_args()

    import os

    import jax

    plat = os.environ.get("FRAG_PLATFORM")
    if plat:  # force CPU for smoke runs (plugin ignores plain JAX_PLATFORMS)
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    from financial_rag_tpu.models.encoder import setup_compilation_cache
    from financial_rag_tpu.ops.topk import bucketed_topk_fused, topk_matmul

    setup_compilation_cache()
    backend = jax.default_backend()
    print(f"# backend={backend}", file=sys.stderr)

    d, nq, k = 384, args.batch, args.k
    rng = np.random.default_rng(0)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    for n in args.scales:
        # stream-generate the corpus to bound host memory
        x = np.empty((n, d), np.float32)
        for lo in range(0, n, 1 << 18):
            hi = min(lo + (1 << 18), n)
            blk = rng.standard_normal((hi - lo, d)).astype(np.float32)
            x[lo:hi] = blk / np.linalg.norm(blk, axis=1, keepdims=True)
        xd = jnp.asarray(x, jnp.bfloat16)
        vd = jnp.ones((n,), jnp.float32)

        configs = {
            "bucketed_fused": lambda qq: bucketed_topk_fused(qq, xd, vd, k, interpret=False),
            "exact_pallas": lambda qq: topk_matmul(qq, xd, vd, k, interpret=False),
        }
        if backend != "tpu":
            from financial_rag_tpu.ops.topk import topk_matmul_reference

            configs = {"xla_ref": lambda qq: topk_matmul_reference(qq, xd, vd, k)}

        qd = jnp.asarray(q)  # keep queries device-resident: per-call host
        # transfers dominate latency on tunneled TPU setups
        for name, raw in configs.items():
            fn = jax.jit(raw)
            t0 = time.time()
            s, i = fn(qd)
            s.block_until_ready()
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(args.iters):
                s, i = fn(qd)
            s.block_until_ready()
            dt = (time.time() - t0) / args.iters
            rec = recall_vs_oracle(np.asarray(i), q, x, k, args.oracle_sample)
            print(json.dumps({
                "config": name, "n_chunks": n, "k": k, "batch": nq,
                "qps": round(nq / dt, 1),
                "latency_ms": round(dt * 1e3, 3),
                "recall_at_k": round(rec, 4),
                "compile_s": round(compile_s, 1),
                "hbm_gb": round(n * d * 2 / 2**30, 2),
            }), flush=True)
        del xd, x


if __name__ == "__main__":
    main()
