#!/usr/bin/env python
"""Concurrent answer streams: continuous-batching JOIN vs independent
per-request speculative streams (VERDICT r4 #1/#6 — the crossover,
measured).

N staggered `/search-stream` clients drive the full path (retrieve ->
rerank -> on-device synthesis -> SSE) in two configurations:

  join : LLM_CONTINUOUS_ROWS=8, MICROBATCH_DIRECT=1 — streams above the
         direct threshold JOIN the shared continuous-batching decode
         (llm/continuous.py), which since round 5 runs SPECULATIVE blocks
         (per-row prompt-lookup drafts, one shared verify pass).
  solo : LLM_CONTINUOUS_ROWS=0 — every stream runs its own per-request
         speculative decode (models/decoder.generate_stream), competing
         for the chip.

Per (mode, N): per-stream time-to-first-answer-token, per-stream ms/token
(first->last token over tokens emitted, tokenized with the LLM's own
tokenizer), aggregate answer tokens/s, and the engine's join/spec stats.

The reference serves each answer as an external Gemini HTTP call
(reference api_adapter.py:18-56) — concurrency is the remote provider's
queue and every answer pays network seconds. Here N concurrent answers
share one chip; this artifact shows how.

Usage: python scripts/bench_continuous.py [--small] [--chunks 4000]
       [--levels 2,4,8] [--max-new 192] [--out BENCH_CONTINUOUS.json]
"""

import argparse
import importlib.util
import json
import os
import sys
import tempfile
import threading
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _mod(name):
    spec = importlib.util.spec_from_file_location(
        name, REPO / "scripts" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def stream_events(client, query: str):
    """Drive /search-stream; returns (t_first_token, t_last_token, text)."""
    t0 = time.time()
    resp = client.post("/search-stream", json={"query": query})
    t_first = t_last = None
    parts = []
    for chunk in resp.response:
        now = time.time() - t0
        for line in bytes(chunk).split(b"\n"):
            if not line.startswith(b"data: "):
                continue
            ev = json.loads(line[6:])
            if ev["type"] == "answer_partial":
                if t_first is None:
                    t_first = now
                t_last = now
                parts.append(ev["data"]["text"])
            elif ev["type"] == "error":
                raise RuntimeError(ev["data"])
    resp.close()
    return t_first, t_last, "".join(parts)


def drive_level(rt, make_client, tok, n_streams: int, queries,
                stagger_s: float):
    """Launch n staggered streams; returns per-stream rows + aggregate."""
    rows = [None] * n_streams
    errs = []

    def worker(i):
        try:
            client = make_client()
            t_first, t_last, text = stream_events(client, queries[i])
            n_tok = len(tok.encode(text).ids) if text else 0
            rows[i] = {"ttft_s": t_first, "t_last_s": t_last,
                       "tokens": n_tok}
        except Exception as e:  # noqa: BLE001
            errs.append(repr(e))

    t0 = time.time()
    threads = []
    for i in range(n_streams):
        th = threading.Thread(target=worker, args=(i,))
        th.start()
        threads.append(th)
        time.sleep(stagger_s)
    for th in threads:
        th.join()
    wall = time.time() - t0
    assert not errs, errs
    assert all(r and r["ttft_s"] is not None for r in rows), rows
    total_tokens = sum(r["tokens"] for r in rows)
    per = []
    for r in rows:
        dur = max(r["t_last_s"] - r["ttft_s"], 1e-9)
        per.append({
            "ttft_ms": round(r["ttft_s"] * 1e3, 1),
            "tokens": r["tokens"],
            "ms_per_token": round(dur * 1e3 / max(r["tokens"] - 1, 1), 2),
        })
    return {
        "streams": per,
        "ttft_ms_p50": round(sorted(p["ttft_ms"] for p in per)[len(per) // 2], 1),
        "ms_per_token_p50": round(
            sorted(p["ms_per_token"] for p in per)[len(per) // 2], 2),
        "aggregate_tokens_per_s": round(total_tokens / wall, 1),
        "wall_s": round(wall, 2),
    }


def build(tmp_ckpt: Path, chunks: int, small: bool, continuous_rows: int,
          spec_k: int):
    bs = _mod("bench_serving")
    be = _mod("bench_e2e_answer")
    os.environ.update({
        "LLM_PROVIDER": "local",
        "LLM_CHECKPOINT": str(tmp_ckpt / "llm"),
        "LLM_DTYPE": "float32" if small else "int8",
        "LLM_CONTINUOUS_ROWS": str(continuous_rows),
        "LLM_CONTINUOUS_SPEC_K": str(spec_k),
        "MICROBATCH_DIRECT": "1",
    })
    tmp_data = tempfile.TemporaryDirectory(prefix="cont_data_")
    rt = be.build_runtime(tmp_data.name, chunks)
    return rt, tmp_data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--chunks", type=int, default=4_000)
    ap.add_argument("--levels", default="2,4,8")
    ap.add_argument("--max-new", type=int, default=192)
    ap.add_argument("--stagger-ms", type=float, default=150.0)
    ap.add_argument("--spec-k", type=int, default=7)
    ap.add_argument("--out", default="BENCH_CONTINUOUS.json")
    args = ap.parse_args()

    plat = os.environ.get("FRAG_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

    bs = _mod("bench_serving")
    be = _mod("bench_e2e_answer")
    tmp_ckpt = tempfile.TemporaryDirectory(prefix="cont_ckpt_")
    ckpt = Path(tmp_ckpt.name)
    (ckpt / "llm").mkdir(parents=True)
    words = list(bs.WORDS) + ["clause"]
    log("writing checkpoints...")
    be.write_llm_checkpoint(ckpt / "llm", words, small=args.small)
    if not args.small:
        bs.write_real_checkpoints(ckpt)
    os.environ["LLM_MAX_NEW_TOKENS"] = str(args.max_new)

    import jax
    backend = jax.default_backend()
    levels = [int(x) for x in args.levels.split(",")]
    rng = np.random.default_rng(11)

    results = {}
    for mode, rows_cfg in (("join", 8), ("solo", 0)):
        log(f"=== mode {mode} (LLM_CONTINUOUS_ROWS={rows_cfg}) ===")
        rt, tmp_data = build(ckpt, args.chunks, args.small, rows_cfg,
                             args.spec_k)
        from werkzeug.test import Client
        app = rt.make_app()
        make_client = lambda: Client(app)  # noqa: E731
        log("warming (load + compile all decode programs)...")
        rt.warm_sweeps()
        # AFTER warm: the LLM's tokenizer is lazily created by load
        tok = rt.engine.llm.inner._tok if hasattr(rt.engine.llm, "inner") \
            else rt.engine.llm._tok
        assert tok is not None, "LLM tokenizer not loaded after warm_sweeps"
        # warm both the direct stream path and (join mode) the engine path:
        # two concurrent streams compile prefill buckets + the segment/spec
        # programs before measurement
        warm_q = [" ".join(rng.choice(bs.WORDS, size=5)) + f" warm {mode} {i}"
                  for i in range(2)]
        drive_level(rt, make_client, tok, 2, warm_q, args.stagger_ms / 1e3)

        per_level = {}
        for n in levels:
            queries = [" ".join(rng.choice(bs.WORDS, size=5))
                       + f" {mode} n{n} s{i}" for i in range(n)]
            r = drive_level(rt, make_client, tok, n, queries,
                            args.stagger_ms / 1e3)
            eng = None
            inner = getattr(rt.engine.llm, "inner", None)
            if inner is not None and getattr(inner, "_engine", None):
                eng = inner._engine.stats()
            r["engine_stats"] = eng
            per_level[str(n)] = r
            log(f"  N={n}: ttft_p50={r['ttft_ms_p50']}ms "
                f"ms/tok_p50={r['ms_per_token_p50']} "
                f"agg={r['aggregate_tokens_per_s']} tok/s "
                f"engine={eng}")
        results[mode] = per_level
        inner = getattr(rt.engine.llm, "inner", None)
        if inner is not None and getattr(inner, "_engine", None):
            inner._engine.close()
        tmp_data.cleanup()

    # crossover summary: at each level, does joining beat solo per-stream
    # AND in aggregate?
    summary = []
    for n in levels:
        j, s = results["join"][str(n)], results["solo"][str(n)]
        summary.append({
            "streams": n,
            "join_ms_per_token_p50": j["ms_per_token_p50"],
            "solo_ms_per_token_p50": s["ms_per_token_p50"],
            "join_aggregate_tok_s": j["aggregate_tokens_per_s"],
            "solo_aggregate_tok_s": s["aggregate_tokens_per_s"],
            "join_wins_per_stream":
                j["ms_per_token_p50"] <= s["ms_per_token_p50"],
            "join_wins_aggregate":
                j["aggregate_tokens_per_s"] >= s["aggregate_tokens_per_s"],
        })

    out = {"metric": "continuous-batching join vs per-request speculative "
                     "streams (staggered /search-stream clients, full RAG "
                     "path)",
           "levels": results, "crossover": summary,
           "max_new_tokens": args.max_new, "n_chunks": args.chunks,
           "spec_k": args.spec_k, "backend": backend,
           "encoders": ("lexical (smoke)" if args.small else
                        "real-architecture 12L + cross-encoder"),
           "llm": ("tiny (smoke)" if args.small else
                   "Qwen2-0.5B shape int8 fused")}
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps({"metric": out["metric"],
                      "crossover": summary, "backend": backend}))
    tmp_ckpt.cleanup()


if __name__ == "__main__":
    main()
