#!/usr/bin/env python
"""Serving soak: concurrent queries + ingest churn + index maintenance.

Evidence for the concurrency work (deferred-materialize epoch guards,
donation-vs-search dispatch discipline, adaptive batcher, mirror/ledger
coherence): Q query threads hammer engine.query while a churn thread
re-ingests and removes documents and a maintenance thread runs compact /
retrain / save — for --seconds wall time. Asserts zero errors, zero
wrong-document attributions (every returned child's text must contain its
own document marker), and a live gauge back at zero.

Usage: python scripts/soak_serving.py [--seconds 120] [--threads 12]
       [--chunks 8000]
"""

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench_serving import WORDS, log  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--threads", type=int, default=12)
    ap.add_argument("--chunks", type=int, default=8000)
    args = ap.parse_args()

    import os
    import tempfile

    import jax

    plat = os.environ.get("FRAG_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    log(f"backend={jax.default_backend()}")

    from bench_serving import build_runtime

    tmp = tempfile.TemporaryDirectory()
    rt = build_runtime(tmp.name, True, args.chunks, seed=0)
    rt.engine.query("soak warmup query")
    rt.warm_sweeps()

    stop = threading.Event()
    errors = []
    wrong_doc = []
    per_worker_queries = [0] * args.threads   # no shared counter races
    # (t_rel_s, latency_ms) per worker: drift evidence without a shared
    # lock on the query hot path (each list has exactly one writer).
    per_worker_lats = [[] for _ in range(args.threads)]
    samples = []  # (t_rel_s, rss_mb, hbm_mb) from the sampler thread
    counts = {"churns": 0, "maintenance": 0}

    def rss_mb() -> float:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
        return 0.0

    def hbm_mb() -> float:
        try:
            stats = jax.local_devices()[0].memory_stats()
            return (stats or {}).get("bytes_in_use", 0) / 1e6
        except Exception:  # noqa: BLE001 — CPU backend has no memory_stats
            return 0.0

    # churn documents: ingested/removed through the REAL pipeline so the
    # indexes see upsert/delete storms while queries are in flight. Each
    # carries a unique marker so misattributed results are detectable.
    def churn_doc(i: int) -> Path:
        marker = f"soakmarker{i:04d}"
        blocks = [{"content": f"{marker} special clause: the escalation is "
                              f"{i % 17} percent with deposit {i}. " * 12,
                   "page": 0}]
        p = Path(tmp.name) / f"soak_{i}.json"
        p.write_text(json.dumps({"blocks": blocks}))
        return p

    def query_worker(wid: int):
        rng = np.random.default_rng(wid)
        while not stop.is_set():
            q = (" ".join(rng.choice(WORDS, size=4))
                 + f" soak{wid}_{per_worker_queries[wid]}")   # unique per worker
            try:
                q_start = time.time()
                out = rt.engine.query(q)
                per_worker_lats[wid].append(
                    (q_start - t0, (time.time() - q_start) * 1000.0))
                if not out.get("success"):
                    errors.append(("query", out.get("answer", "")[:80]))
                for c in out.get("top_children_chunks", []):
                    doc = c.get("document_name") or ""
                    text = c.get("text") or ""
                    # churn docs must surface their own marker text
                    if str(doc).startswith("soakdoc") and doc.replace(
                            "soakdoc", "soakmarker") not in text:
                        wrong_doc.append((doc, text[:60]))
            except Exception as e:  # noqa: BLE001 — count, don't crash
                errors.append(("query", repr(e)[:120]))
            per_worker_queries[wid] += 1

    def churn_worker():
        i = 0
        while not stop.is_set():
            try:
                p = churn_doc(i)
                rt.pipeline.ingest_extracted_json(p, f"soakdoc{i:04d}")
                if i >= 3:
                    rt.pipeline.remove_document(f"soakdoc{i-3:04d}")
            except Exception as e:  # noqa: BLE001
                errors.append(("churn", repr(e)[:120]))
            counts["churns"] += 1
            i += 1

    def maintenance_worker():
        while not stop.is_set():
            try:
                for idx in rt.indexes.values():
                    if hasattr(idx, "compact"):
                        idx.compact()
                rt.save_indexes(tmp.name)
            except Exception as e:  # noqa: BLE001
                errors.append(("maintenance", repr(e)[:120]))
            counts["maintenance"] += 1
            stop.wait(2.0)

    def sampler_worker():
        while not stop.is_set():
            samples.append((time.time() - t0, rss_mb(), hbm_mb()))
            stop.wait(15.0)

    threads = ([threading.Thread(target=query_worker, args=(w,))
                for w in range(args.threads)]
               + [threading.Thread(target=churn_worker),
                  threading.Thread(target=maintenance_worker),
                  threading.Thread(target=sampler_worker)])
    t0 = time.time()
    for t in threads:
        t.start()
    time.sleep(args.seconds)
    stop.set()
    for t in threads:
        t.join(timeout=60)
    wall = time.time() - t0
    rt.engine.flush_background()

    gauge = rt.engine.active.value() if rt.engine.active is not None else 0
    n_queries = sum(per_worker_queries)

    # Latency drift: p50/p95 per 60s window across the whole run. Memory
    # drift / HBM fragmentation shows up as a rising tail; a healthy soak
    # holds the last window within noise of the first.
    all_lats = sorted(e for lats in per_worker_lats for e in lats)
    win = 60.0
    windows = []
    if all_lats:
        n_win = max(1, int(wall // win) + (1 if wall % win > 5 else 0))
        for w in range(n_win):
            vals = [ms for (ts, ms) in all_lats if w * win <= ts < (w + 1) * win]
            if len(vals) >= 10:
                windows.append({
                    "minute": w,
                    "n": len(vals),
                    "p50_ms": round(float(np.percentile(vals, 50)), 1),
                    "p95_ms": round(float(np.percentile(vals, 95)), 1),
                })
    drift = (round(windows[-1]["p95_ms"] / windows[0]["p95_ms"], 3)
             if len(windows) >= 2 else None)
    row = {
        "metric": "serving soak (concurrent query + ingest churn + compact/save)",
        "seconds": round(wall, 1),
        "queries": n_queries,
        "qps": round(n_queries / wall, 1),
        "churn_cycles": counts["churns"],
        "maintenance_cycles": counts["maintenance"],
        "errors": len(errors),
        "wrong_document_attributions": len(wrong_doc),
        "gauge_after": gauge,
        "backend": jax.default_backend(),
        "p95_by_minute": windows,
        "p95_drift_last_over_first": drift,
        "rss_mb_start": round(samples[0][1], 1) if samples else None,
        "rss_mb_end": round(samples[-1][1], 1) if samples else None,
        "hbm_mb_start": round(samples[0][2], 1) if samples else None,
        "hbm_mb_end": round(samples[-1][2], 1) if samples else None,
    }
    print(json.dumps(row))
    for kind, msg in errors[:10]:
        log(f"ERROR[{kind}]: {msg}")
    for doc, text in wrong_doc[:10]:
        log(f"WRONG-DOC: {doc}: {text}")
    ok = not errors and not wrong_doc and gauge == 0
    log("soak OK" if ok else "soak FAILED")
    tmp.cleanup()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
