#!/usr/bin/env python
"""End-to-end serving throughput: concurrent engine.query with and without
cross-request micro-batching (serving/batcher.py).

Unlike bench.py (pure kernel slopes), this drives the FULL query path —
encode -> per-model index sweep -> fusion -> BM25 -> parent expansion ->
response build — from T concurrent request threads, the way the WSGI
server does (reference api_server.py:857-882 runs one thread per request
with batch-1 device calls; the micro-batcher is this framework's answer).

Corpus is synthetic financial text ingested through the real pipeline
stores (child metadata + parent store + flat index). Queries are unique
strings (the md5 result cache never hits), drawn from corpus vocabulary so
BM25 and dense retrieval both do real work.

Usage: python scripts/bench_serving.py [--chunks 20000] [--threads 16]
       [--queries 256] [--out BENCH_SERVING.json]
Prints one BENCH-style JSON line per mode plus the speedup.
"""

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WORDS = ("rent lease invoice amount gst tax lessor lessee tenant landlord "
         "credit note payment deposit lock-in period escalation clause "
         "maintenance charges premises quarterly annual agreement renewal "
         "termination notice interest penalty arrears utilities parking").split()


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_runtime(tmp, microbatch: bool, n_chunks: int, seed: int = 0):
    import os

    os.environ["SERVE_MICROBATCH"] = "1" if microbatch else "0"
    from financial_rag_tpu.config import FrameworkConfig
    from financial_rag_tpu.runtime import Runtime

    cfg = FrameworkConfig.from_env()
    cfg.serving.microbatch = microbatch
    cfg.index.capacity = max(n_chunks + 1024, 1 << 14)
    rt = Runtime.build(cfg, data_dir=tmp)

    rng = np.random.default_rng(seed)
    ids = np.arange(1, n_chunks + 1, dtype=np.int64)
    texts = [" ".join(rng.choice(WORDS, size=24)) + f" clause {i}"
             for i in range(n_chunks)]

    t0 = time.time()
    rt.parent_store.upsert_parents([
        {"parent_id": int(1_000_000 + i), "document_id": f"doc_{i % 64}",
         "page_start": 1, "page_end": 1, "content": texts[i]}
        for i in range(n_chunks)])
    rt.child_meta.upsert_children([
        {"child_id": int(ids[i]), "parent_id": int(1_000_000 + i),
         "document_id": f"doc_{i % 64}", "snippet": texts[i], "context": "",
         "source_path": f"Source_Documents/doc_{i % 64}.json",
         "source_mtime": 1700000000.0}
        for i in range(n_chunks)])
    for name, enc in rt.dual_encoder.encoders.items():
        vecs = enc.encode(texts)
        for lo in range(0, n_chunks, 16_384):
            rt.indexes[name].upsert(ids[lo: lo + 16_384], vecs[lo: lo + 16_384])
    log(f"ingested {n_chunks} chunks in {time.time()-t0:.1f}s "
        f"(microbatch={'on' if microbatch else 'off'})")
    return rt


def drive(rt, n_threads: int, n_queries: int, seed: int = 1):
    rng = np.random.default_rng(seed)
    queries = [" ".join(rng.choice(WORDS, size=5)) + f" q{seed}_{i}"
               for i in range(n_queries)]
    rt.engine.query(queries[0] + " warmup")  # compile/prime everything

    errors = []
    latencies = []
    lock = threading.Lock()
    cursor = {"i": 0}

    def worker():
        while True:
            with lock:
                i = cursor["i"]
                if i >= n_queries:
                    return
                cursor["i"] = i + 1
            t0 = time.time()
            try:
                out = rt.engine.query(queries[i])
                if not out.get("success") or not out.get("top_children_chunks"):
                    errors.append(i)
            except Exception:  # noqa: BLE001 — count, don't crash the bench
                errors.append(i)
            with lock:
                latencies.append(time.time() - t0)

    t0 = time.time()
    threads = [threading.Thread(target=worker) for _ in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    lat = np.sort(np.asarray(latencies))
    return {
        "wall_s": wall,
        "qps": n_queries / wall,
        "p50_ms": float(lat[len(lat) // 2] * 1e3),
        "p95_ms": float(lat[int(len(lat) * 0.95)] * 1e3),
        "errors": len(errors),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=20_000)
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--out", default="BENCH_SERVING.json")
    args = ap.parse_args()

    import os
    import tempfile

    import jax

    # FRAG_PLATFORM=cpu forces the CPU backend even where the TPU plugin
    # force-registers itself (same dance as Runtime.build)
    plat = os.environ.get("FRAG_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    backend = jax.default_backend()
    log(f"backend={backend}")

    results = []
    stats = {}
    for mode in (False, True):
        with tempfile.TemporaryDirectory() as tmp:
            rt = build_runtime(tmp, mode, args.chunks, seed=0)
            r = drive(rt, args.threads, args.queries)
            rt.engine.flush_background()   # deferred trace/cache writes
            stats[mode] = r
            label = "microbatch" if mode else "thread-per-request"
            row = {"metric": f"serving QPS ({label}, {args.threads} threads, "
                             f"{args.chunks // 1000}k chunks, full query path)",
                   "value": round(r["qps"], 1), "unit": "qps",
                   "vs_baseline": None,
                   "p50_ms": round(r["p50_ms"], 1), "p95_ms": round(r["p95_ms"], 1),
                   "errors": r["errors"], "backend": backend}
            if mode and rt.hybrid.sweep_batcher is not None:
                row["batch_stats"] = rt.hybrid.sweep_batcher.stats()
            log(json.dumps(row))
            results.append(row)

    speedup = stats[True]["qps"] / max(stats[False]["qps"], 1e-9)
    results.append({"metric": "micro-batching speedup (QPS on / QPS off)",
                    "value": round(speedup, 3), "unit": "x",
                    "vs_baseline": round(speedup, 3), "backend": backend})
    Path(args.out).write_text("\n".join(json.dumps(r) for r in results) + "\n")
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
