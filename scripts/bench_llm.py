#!/usr/bin/env python
"""On-device decoder LM benchmark: prefill throughput + decode latency.

Measures models/decoder.py at a Qwen2-0.5B-shaped configuration (random
bf16 weights — real checkpoints are unobtainable here, RECALL.md §1; the
architecture, shapes and therefore the perf are identical). The whole
generate call is ONE device dispatch, so wall time over a multi-hundred-
token generation is compute-dominated even through this env's ~35 ms/RPC
tunnel.

Reference counterpart: none on-device — answer synthesis is an external
HTTP API (reference api_adapter.py:18-56), seconds per answer and
unusable offline. Rows land in BENCH_LLM.json.

Usage: python scripts/bench_llm.py [--small]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny config (CPU smoke mode)")
    ap.add_argument("--out", default=None, help="append rows to this file")
    args = ap.parse_args()

    import os
    import jax
    import jax.numpy as jnp

    plat = os.environ.get("FRAG_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    backend = jax.default_backend()

    from financial_rag_tpu.models.decoder import (
        DecoderConfig, generate_tokens, random_decoder_params)

    if args.small:
        cfg = DecoderConfig(vocab_size=1024, num_layers=2, hidden_size=128,
                            num_heads=4, num_kv_heads=2, intermediate_size=512,
                            attention_bias=True, tie_embeddings=True,
                            eos_token_id=0)
    else:
        # Qwen2-0.5B-instruct shape (HF config.json of Qwen/Qwen2-0.5B)
        cfg = DecoderConfig(vocab_size=151_936, num_layers=24, hidden_size=896,
                            num_heads=14, num_kv_heads=2,
                            intermediate_size=4864, rope_theta=1e6,
                            attention_bias=True, tie_embeddings=True,
                            eos_token_id=151_643)
    from financial_rag_tpu.models.decoder import quantize_decoder_params

    params_bf16 = random_decoder_params(cfg, seed=0, dtype=jnp.bfloat16)
    n_params = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params_bf16))
    print(f"backend={backend} params={n_params/1e6:.0f}M", file=sys.stderr)

    rows = []
    rng = np.random.default_rng(0)

    def run(batch, prompt_len, max_new, params):
        ids = jnp.asarray(rng.integers(1, 1000, (batch, prompt_len)), jnp.int32)
        am = jnp.ones((batch, prompt_len), jnp.int32)
        key = jax.random.PRNGKey(0)

        def call(mn):
            t = generate_tokens(params, ids, am, key, cfg=cfg,
                                max_new_tokens=mn)
            return np.asarray(t)  # materialize = the only fence here

        _ = call(max_new)                     # compile + warm both lengths
        _ = call(max_new // 2)
        # decode cost per token = slope between two generation lengths
        # (subtracts prefill AND the tunnel's fixed RPC cost)
        t0 = time.time(); _ = call(max_new // 2); t_half = time.time() - t0
        t0 = time.time(); _ = call(max_new); t_full = time.time() - t0
        per_tok = max((t_full - t_half) / (max_new - max_new // 2), 1e-9)
        return per_tok, t_full

    pl, mn = (64, 32) if args.small else (512, 256)

    per_tok, t_full = run(1, pl, mn, params_bf16)
    rows.append({
        "metric": f"LLM decode latency, batch 1 ({'tiny' if args.small else 'Qwen2-0.5B shape'}, bf16, {pl}-token prompt)",
        "value": round(per_tok * 1e3, 2), "unit": "ms/token",
        "vs_baseline": None, "tokens_per_s": round(1.0 / per_tok, 1),
        "full_generate_s": round(t_full, 2), "max_new_tokens": mn,
        "params_m": round(n_params / 1e6), "backend": backend,
        "note": "slope between two generation lengths — prefill and RPC cost subtracted; one device dispatch per generation",
    })

    params_int8 = quantize_decoder_params(params_bf16)
    per_tok_q, t_full_q = run(1, pl, mn, params_int8)
    rows.append({
        "metric": "LLM decode latency, batch 1, int8 weight-only (same config)",
        "value": round(per_tok_q * 1e3, 2), "unit": "ms/token",
        "vs_baseline": round(per_tok / per_tok_q, 2),
        "tokens_per_s": round(1.0 / per_tok_q, 1),
        "full_generate_s": round(t_full_q, 2),
        "params_m": round(n_params / 1e6), "backend": backend,
        "note": "vs_baseline = bf16 ms/token over int8 ms/token (weight-read bound)",
    })

    # the layout serving actually runs (local_llm.py fuses after quant):
    # q/k/v -> one matmul, gate/up -> one. Same bytes, fewer per-op
    # latencies on the decode scan's critical path.
    from financial_rag_tpu.models.decoder import fuse_decoder_params

    params_fused = fuse_decoder_params(params_int8)
    per_tok_f, t_full_f = run(1, pl, mn, params_fused)
    rows.append({
        "metric": "LLM decode latency, batch 1, int8 + fused qkv/gate-up (the serving layout)",
        "value": round(per_tok_f * 1e3, 2), "unit": "ms/token",
        "vs_baseline": round(per_tok / per_tok_f, 2),
        "tokens_per_s": round(1.0 / per_tok_f, 1),
        "full_generate_s": round(t_full_f, 2),
        "params_m": round(n_params / 1e6), "backend": backend,
        "note": "vs_baseline = bf16-split ms/token over this; exact same tokens as the split layout (tested bit-equal)",
    })

    # prompt-lookup speculative decoding on the serving layout: same greedy
    # tokens, multiple tokens per weight-stream-bound step. Acceptance here
    # comes from the rollout's self-repetition (a random-weight greedy
    # rollout cycles, like extractive RAG answers quote their context);
    # tokens_per_step reports it, verify_step_ms bounds the 0%-acceptance
    # worst case.
    from financial_rag_tpu.models.decoder import generate_tokens_spec

    ids_sp = jnp.asarray(rng.integers(1, 1000, (1, pl)), jnp.int32)
    am_sp = jnp.ones((1, pl), jnp.int32)

    def spec_call(mn_i):
        t, steps = generate_tokens_spec(params_fused, ids_sp, am_sp, cfg=cfg,
                                        max_new_tokens=mn_i, draft_k=7)
        return np.asarray(t), int(steps)

    _, _ = spec_call(mn)                       # compile + warm both lengths
    _, _ = spec_call(mn // 2)
    t0 = time.time(); _, st_h = spec_call(mn // 2); t_half_s = time.time() - t0
    t0 = time.time(); _, st_f = spec_call(mn); t_full_s = time.time() - t0
    per_tok_s = max((t_full_s - t_half_s) / (mn - mn // 2), 1e-9)
    tps = (mn - mn // 2) / max(st_f - st_h, 1)
    rows.append({
        "metric": "LLM decode latency, batch 1, speculative prompt-lookup (serving layout, draft_k=7)",
        "value": round(per_tok_s * 1e3, 2), "unit": "ms/token",
        "vs_baseline": round(per_tok_f / per_tok_s, 2),
        "tokens_per_s": round(1.0 / per_tok_s, 1),
        "tokens_per_step": round(tps, 2),
        "verify_step_ms": round(per_tok_s * tps * 1e3, 2),
        "steps_full": st_f, "full_generate_s": round(t_full_s, 2),
        "params_m": round(n_params / 1e6), "backend": backend,
        "note": "vs_baseline = non-speculative serving layout over this; greedy-equivalent (exact in exact arithmetic; bf16 near-ties may resolve differently, as in any batched-verify speculative decoder). tokens_per_step = marginal acceptance on this rollout; verify_step_ms = per-step cost = the 0%-acceptance floor",
    })

    b = 2 if args.small else 8
    per_tok_b, t_full_b = run(b, pl, mn, params_bf16)
    rows.append({
        "metric": f"LLM decode throughput, batch {b} (same config)",
        "value": round(b / per_tok_b, 1), "unit": "tokens/s",
        "vs_baseline": None,
        "ms_per_step": round(per_tok_b * 1e3, 2),
        "full_generate_s": round(t_full_b, 2),
        "params_m": round(n_params / 1e6), "backend": backend,
    })

    # streaming: time to the FIRST text block (prefill + one segment) vs
    # the full one-shot generation — the answer_partial latency users see
    from financial_rag_tpu.models.decoder import generate_stream

    seg = 48
    ids_s = jnp.asarray(rng.integers(1, 1000, (1, pl)), jnp.int32)
    am_s = jnp.ones((1, pl), jnp.int32)

    def first_block():
        it = generate_stream(params_bf16, ids_s, am_s, jax.random.PRNGKey(0),
                             cfg=cfg, max_new_tokens=mn, segment=seg)
        t0 = time.time()
        blk = next(it)
        dt = time.time() - t0
        it.close()
        return dt, blk.shape[1]

    _ = first_block()                          # compile + warm
    dts = sorted(first_block()[0] for _ in range(3))
    rows.append({
        "metric": f"LLM time-to-first-tokens (streaming, segment={seg}, {pl}-token prompt)",
        "value": round(dts[1] * 1e3, 1), "unit": "ms",
        "vs_baseline": round(t_full / dts[1], 2),
        "note": "median of 3; vs_baseline = full one-shot generation time over this — the latency gain answer_partial streaming gives the first words",
        "params_m": round(n_params / 1e6), "backend": backend,
    })

    # the serving streaming path: speculative segments on the serving layout
    from financial_rag_tpu.models.decoder import generate_stream_spec

    def first_block_spec():
        it = generate_stream_spec(params_fused, ids_s, am_s, cfg=cfg,
                                  max_new_tokens=mn, segment=seg, draft_k=7)
        t0 = time.time()
        blk = next(it)
        dt = time.time() - t0
        it.close()
        return dt

    _ = first_block_spec()                     # compile + warm
    dts_sp = sorted(first_block_spec() for _ in range(3))
    rows.append({
        "metric": f"LLM time-to-first-tokens, speculative serving layout (segment={seg}, {pl}-token prompt)",
        "value": round(dts_sp[1] * 1e3, 1), "unit": "ms",
        "vs_baseline": round(dts[1] / dts_sp[1], 2),
        "note": "median of 3; vs_baseline = bf16 plain streaming TTFT over this (int8+fused weights AND speculative segments both cut the first block's decode time)",
        "params_m": round(n_params / 1e6), "backend": backend,
    })

    # prefill: slope over BATCH at max_new=1 (batch 1 vs 8 differ by 7
    # prompt-prefills ~ 17ms of compute at this shape, comfortably above
    # the tunnel's per-RPC jitter; per-length slopes are not)
    key = jax.random.PRNGKey(0)

    def prefill(batch):
        ids = jnp.asarray(rng.integers(1, 1000, (batch, pl)), jnp.int32)
        am = jnp.ones((batch, pl), jnp.int32)

        def call():
            return np.asarray(generate_tokens(params_bf16, ids, am, key,
                                              cfg=cfg, max_new_tokens=1))

        _ = call()                                # compile + warm
        ts = sorted(_timed(call) for _ in range(5))
        return ts[2]                              # median of 5

    t1, t8 = prefill(1), prefill(8)
    per_prefill_tok = max((t8 - t1) / (7 * pl), 1e-9)
    rows.append({
        "metric": "LLM prefill throughput (same config, batch-1 vs batch-8 slope, medians of 5)",
        "value": round(1.0 / per_prefill_tok, 0), "unit": "tokens/s",
        "vs_baseline": None, "prompt_len": pl,
        "t_batch1_ms": round(t1 * 1e3, 1), "t_batch8_ms": round(t8 * 1e3, 1),
        "params_m": round(n_params / 1e6), "backend": backend,
    })

    # ---- causal flash prefill (ops/causal_flash.py) vs XLA at the ANSWER
    # bucket (4096: what the 5-parent serving prompt actually hits). ABBA-
    # paired absolutes (tunnel drift, see bench_serving.py); max_new=64 so
    # the (identical) decode tail stays small next to the prefill delta.
    from financial_rag_tpu.models.decoder import resolve_prefill_impl

    pl_ans = 128 if args.small else 4096
    mn_ans = 8 if args.small else 64
    if resolve_prefill_impl(cfg, pl_ans) == "pallas" or args.small:
        ids_a = jnp.asarray(rng.integers(1, 1000, (1, pl_ans)), jnp.int32)
        am_a = jnp.ones((1, pl_ans), jnp.int32)

        def ans_call(impl):
            return np.asarray(generate_tokens(
                params_fused, ids_a, am_a, key, cfg=cfg,
                max_new_tokens=mn_ans, prefill_impl=impl))

        same = np.array_equal(ans_call("xla"), ans_call("pallas"))  # +compile
        ts = {"xla": [], "pallas": []}
        for order in ("xla", "pallas", "pallas", "xla",
                      "xla", "pallas", "pallas", "xla"):
            ts[order].append(_timed(lambda: ans_call(order)))
        t_x, t_p = (sorted(ts["xla"])[1], sorted(ts["pallas"])[1])
        rows.append({
            "metric": f"LLM prefill, {pl_ans}-token answer prompt + {mn_ans} decode "
                      "(int8 fused serving layout): Pallas causal flash vs XLA",
            "value": round(t_p * 1e3, 1), "unit": "ms",
            "vs_baseline": round(t_x / t_p, 2),
            "t_xla_ms": round(t_x * 1e3, 1),
            "tokens_equal": bool(same),
            "params_m": round(n_params / 1e6), "backend": backend,
            "note": "vs_baseline = XLA-prefill wall over Pallas-prefill wall, "
                    "ABBA-paired medians of 4; scores never touch HBM "
                    "(~940 MB/layer f32 at this bucket on the XLA path)",
        })

    for r in rows:
        print(json.dumps(r))
    if args.out:
        with open(args.out, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
