#!/usr/bin/env python
"""End-to-end RAG answer benchmark: the COMPLETE serving path on one chip.

query -> exact WordPiece tokenize -> dual 12-layer encode -> fused dual-
index sweep -> RRF fusion + BM25 merge -> cross-encoder rerank -> prompt
build (5 parents x 3000 chars, llm/prompts.py) -> on-device 0.5B decoder
synthesis (int8 fused weights + prompt-lookup speculation) -> SSE events
through the real WSGI app (`/search-stream`).

The reference cannot run this path at all without network: its answer
synthesis is an external Gemini HTTP call (reference api_adapter.py:18-56)
behind an artificial 0.5 s SSE inter-event delay (api_server.py:1137), so
its first answer byte cannot arrive before the full remote generation
returns. Here the answer is synthesized on the same chip that retrieved the
context, and the first tokens stream as soon as the first decode segment
lands.

Encoders/reranker are random-weight REAL-architecture 12L checkpoints
(bench_serving.write_real_checkpoints) and the LLM is a random-weight
Qwen2-0.5B-shape HF checkpoint: identical shapes => identical device cost
to downloaded weights (RECALL.md §1: real weights are unobtainable here).
The tokenizer is word-level over the corpus vocabulary so prompt token
counts are word-realistic (~2.5-3k tokens for 5 parents; the 4096 prompt
bucket).

Usage: python scripts/bench_e2e_answer.py [--small] [--chunks 6000]
       [--reps 8] [--out BENCH_E2E_ANSWER.json]
"""

import argparse
import importlib.util
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _bench_serving():
    spec = importlib.util.spec_from_file_location(
        "bench_serving", REPO / "scripts" / "bench_serving.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def write_llm_checkpoint(dest: Path, words, small: bool) -> None:
    """Random-weight HF Qwen2 checkpoint + word-level tokenizer.

    The vocab covers the corpus words + numerals + ChatML specials, so the
    answer prompt tokenizes ~1 token/word (close to BPE on English prose)
    and the chat template engages LocalLLM's chatml wrap.
    """
    import torch
    import transformers
    from tokenizers import Tokenizer
    from tokenizers import models as tok_models
    from tokenizers import pre_tokenizers

    vocab = {w: i for i, w in enumerate(sorted(set(words)))}
    for extra in [str(n) for n in range(100)] + [
            "<unk>", "<|im_start|>", "<|im_end|>", "user", "assistant",
            "Context", "document", "pages", "Question", "Answer"]:
        if extra not in vocab:
            vocab[extra] = len(vocab)
    eos_id = vocab["<|im_end|>"]
    # Every model id must decode to SOME word: a random-weight model's
    # greedy argmax lands anywhere in the 151,936-id space, and ids the
    # tokenizer cannot decode produce empty text -> zero answer deltas ->
    # the stream looks broken when only the WEIGHTS are fake. Pad the
    # tokenizer vocab with filler words up to the model's vocab size.
    full_vocab = 151_936 if not small else max(512, len(vocab))
    for i in range(len(vocab), full_vocab):
        vocab[f"w{i}"] = i

    torch.manual_seed(7)
    if small:
        cfg = transformers.Qwen2Config(
            vocab_size=max(512, len(vocab)), hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=256,
            max_position_embeddings=8192, tie_word_embeddings=True,
            eos_token_id=eos_id, bos_token_id=eos_id)
    else:
        # Qwen2-0.5B-instruct shape (HF config.json of Qwen/Qwen2-0.5B);
        # full 151,936 vocab so embed-gather + tied logits matmul cost what
        # they cost with the real checkpoint
        cfg = transformers.Qwen2Config(
            vocab_size=151_936, hidden_size=896, num_hidden_layers=24,
            num_attention_heads=14, num_key_value_heads=2,
            intermediate_size=4864, max_position_embeddings=32768,
            rope_theta=1e6, tie_word_embeddings=True,
            eos_token_id=eos_id, bos_token_id=eos_id)
    with torch.no_grad():
        model = transformers.Qwen2ForCausalLM(cfg).to(torch.bfloat16)
    model.save_pretrained(str(dest), safe_serialization=True)

    tok = Tokenizer(tok_models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(dest / "tokenizer.json"))
    (dest / "tokenizer_config.json").write_text(json.dumps({
        "chat_template": "{% for m in messages %}<|im_start|>{{ m.role }}\n"
                         "{{ m.content }}<|im_end|>\n{% endfor %}"}))


def build_runtime(tmp: str, n_chunks: int, seed: int = 0):
    """Corpus with LONG parents (~480 words) so the answer prompt's
    3000-char-per-parent cap binds and prefill runs at the real 4096-token
    bucket — bench_serving's 24-word parents would make synthesis-side
    prefill unrealistically cheap."""
    from financial_rag_tpu.config import FrameworkConfig
    from financial_rag_tpu.runtime import Runtime

    bs = _bench_serving()
    cfg = FrameworkConfig.from_env()
    cfg.index.capacity = max(n_chunks + 1024, 1 << 14)
    rt = Runtime.build(cfg, data_dir=tmp)

    rng = np.random.default_rng(seed)
    children_per_parent = 4
    n_parents = max(1, n_chunks // children_per_parent)
    parents, children, texts, ids = [], [], [], []
    cid = 0
    for p in range(n_parents):
        segs = [" ".join(rng.choice(bs.WORDS, size=24)) + f" clause {p} {c}"
                for c in range(children_per_parent)]
        # parent = its children's text tiled to ~480 words (> the 3000-char
        # prompt cap), as the chunker's parent/child overlap produces
        body = " ".join(segs)
        parents.append({
            "parent_id": 1_000_000 + p, "document_id": f"doc_{p % 64}",
            "page_start": 1, "page_end": 2,
            "content": (body + " ") * 5})
        for c, seg in enumerate(segs):
            cid += 1
            ids.append(cid)
            texts.append(seg)
            children.append({
                "child_id": cid, "parent_id": 1_000_000 + p,
                "document_id": f"doc_{p % 64}", "snippet": seg, "context": "",
                "source_path": f"Source_Documents/doc_{p % 64}.json",
                "source_mtime": 1700000000.0})
    t0 = time.time()
    rt.parent_store.upsert_parents(parents)
    rt.child_meta.upsert_children(children)
    idarr = np.asarray(ids, np.int64)
    for name, enc in rt.dual_encoder.encoders.items():
        inner = getattr(enc, "inner", enc)
        for lo in range(0, len(texts), 8_192):
            vecs = inner.encode(texts[lo: lo + 8_192])
            rt.indexes[name].upsert(idarr[lo: lo + 8_192], vecs)
    log(f"ingested {len(texts)} children / {n_parents} parents "
        f"in {time.time()-t0:.1f}s")
    return rt


def stream_once(client, query: str):
    """Drive /search-stream; return per-event-type first-arrival times (s),
    completion time, and the assembled answer text."""
    t0 = time.time()
    resp = client.post("/search-stream", json={"query": query})
    first, answer_parts, t_done = {}, [], None
    for chunk in resp.response:          # one yield per SSE event
        now = time.time() - t0
        for line in bytes(chunk).split(b"\n"):
            if not line.startswith(b"data: "):
                continue
            ev = json.loads(line[6:])
            first.setdefault(ev["type"], now)
            if ev["type"] == "answer_partial":
                answer_parts.append(ev["data"]["text"])
            elif ev["type"] == "complete":
                t_done = now
            elif ev["type"] == "error":
                raise RuntimeError(f"stream error: {ev['data']}")
    resp.close()
    return first, t_done, "".join(answer_parts)


def pctls(xs):
    xs = sorted(xs)
    return (round(xs[len(xs) // 2] * 1e3, 1),
            round(xs[min(len(xs) - 1, int(len(xs) * 0.95))] * 1e3, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny LLM + lexical encoders (CPU smoke mode)")
    ap.add_argument("--chunks", type=int, default=6_000)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--max-new", type=int, default=256)
    ap.add_argument("--out", default="BENCH_E2E_ANSWER.json")
    args = ap.parse_args()

    plat = os.environ.get("FRAG_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

    bs = _bench_serving()
    tmp_ckpt = tempfile.TemporaryDirectory(prefix="e2e_ckpt_")
    llm_dir = Path(tmp_ckpt.name) / "llm"
    llm_dir.mkdir(parents=True)
    words = list(bs.WORDS) + ["clause"]
    log("writing LLM checkpoint...")
    write_llm_checkpoint(llm_dir, words, small=args.small)
    if not args.small:
        log("writing encoder checkpoints...")
        bs.write_real_checkpoints(Path(tmp_ckpt.name))
    os.environ.update({
        "LLM_PROVIDER": "local", "LLM_CHECKPOINT": str(llm_dir),
        "LLM_DTYPE": "float32" if args.small else "int8",
        "LLM_MAX_NEW_TOKENS": str(args.max_new)})

    import jax
    backend = jax.default_backend()
    tmp_data = tempfile.TemporaryDirectory(prefix="e2e_data_")
    rt = build_runtime(tmp_data.name, args.chunks)

    from werkzeug.test import Client
    client = Client(rt.make_app())

    rng = np.random.default_rng(3)
    queries = [" ".join(rng.choice(bs.WORDS, size=5)) + f" clause {i}"
               for i in range(args.reps + 2)]
    # warm exactly as the real server does at startup (Runtime.warm_sweeps ->
    # _warm_llm): load the checkpoint and precompile prefill/decode/one-shot
    # programs BEFORE driving the app — the first /search-stream otherwise
    # spends minutes inside the SSE phase deadline on load + compile
    log("warming LLM (load + compile prefill/decode programs)...")
    t0 = time.time()
    rt.warm_sweeps()
    log(f"warm done in {time.time()-t0:.1f}s")

    log("warmup (compiles encode/sweep/rerank + prefill/decode buckets)...")
    t0 = time.time()
    first, t_done, ans = stream_once(client, queries[0])
    log(f"warmup 1: {time.time()-t0:.1f}s events={sorted(first)} "
        f"answer_len={len(ans)}")
    assert "answer_partial" in first, \
        "no answer_partial events — local LLM did not stream"
    stream_once(client, queries[1])

    ttfe, ttfa, total = [], [], []
    for q in queries[2:]:
        first, t_done, ans = stream_once(client, q)
        ttfe.append(first["chunks"])
        ttfa.append(first["answer_partial"])
        total.append(t_done)
        log(f"  chunks {first['chunks']*1e3:6.1f}ms  first-tokens "
            f"{first['answer_partial']*1e3:6.1f}ms  complete "
            f"{t_done*1e3:7.1f}ms  answer_chars={len(ans)}")

    # sync /search total for the non-streaming API (one-shot generate jits
    # separately from the segmented stream — warm it outside the loop)
    client.post("/search", json={"query": queries[0] + " sync warmup"})
    sync = []
    for q in queries[2:]:
        t0 = time.time()
        r = client.post("/search", json={"query": q + " sync"})
        assert r.status_code == 200, r.status_code
        sync.append(time.time() - t0)

    enc_label = "lexical (smoke)" if args.small else \
        "real-architecture 12L checkpoints + cross-encoder"
    llm_label = "tiny (smoke)" if args.small else \
        "Qwen2-0.5B shape, int8 fused, prompt-lookup speculation"
    common = {"encoders": enc_label, "llm": llm_label,
              "n_chunks": args.chunks, "max_new_tokens": args.max_new,
              "reps": args.reps, "backend": backend}
    p50, p95 = pctls(ttfa)
    rows = [{
        "metric": "e2e RAG answer: time-to-first-answer-tokens "
                  "(/search-stream: retrieve + rerank + prompt prefill + "
                  "first decode segment)",
        "value": p50, "unit": "ms", "vs_baseline": None, "p95_ms": p95,
        "note": "reference's first answer byte cannot precede its full "
                "external Gemini generation + 0.5s artificial SSE delay "
                "(api_adapter.py:18-56, api_server.py:1137)", **common}]
    p50, p95 = pctls(total)
    rows.append({
        "metric": f"e2e RAG answer: complete {args.max_new}-token answer "
                  "latency (/search-stream, retrieval through synthesis)",
        "value": p50, "unit": "ms", "vs_baseline": None, "p95_ms": p95,
        **common})
    p50, p95 = pctls(ttfe)
    rows.append({
        "metric": "e2e chunks time-to-first-event with local LLM configured",
        "value": p50, "unit": "ms",
        "vs_baseline": round(500.0 / max(p50, 1e-9), 1),
        "note": "vs_baseline = reference's artificial 0.5s first-event delay"
                " / this p50", "p95_ms": p95, **common})
    p50, p95 = pctls(sync)
    rows.append({
        "metric": "e2e RAG answer: one-shot /search latency (same path, "
                  "non-streaming)",
        "value": p50, "unit": "ms", "vs_baseline": None, "p95_ms": p95,
        **common})

    payload = "\n".join(json.dumps(r) for r in rows) + "\n"
    Path(args.out).write_text(payload)
    for r in rows:
        print(json.dumps(r))
    tmp_data.cleanup()
    tmp_ckpt.cleanup()


if __name__ == "__main__":
    main()
