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
    counts = {"churns": 0, "maintenance": 0}

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
                out = rt.engine.query(q)
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

    threads = ([threading.Thread(target=query_worker, args=(w,))
                for w in range(args.threads)]
               + [threading.Thread(target=churn_worker),
                  threading.Thread(target=maintenance_worker)])
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
