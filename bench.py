"""Headline benchmarks: the three hot-path numbers in one JSON line.

1. search QPS on a 100k-chunk child index (primary metric) — BASELINE.md
   target >=50,000 QPS (v5e-8 budget; runs on however many chips are
   visible — currently one). Fused Pallas bucketed top-k sweep (k=24, the
   reference's retrieval candidate count) over a bf16 [100k, 384] corpus,
   128-query batch, plus recall@24 vs an exact f32 numpy oracle.
2. encode throughput (chunks/s/chip): 12-layer 384-d bf16 encoder forward,
   batch 128 x seq 512 with fused Pallas attention (the ingest hot loop;
   replaces reference local_embedder.py:160-184's batch-1 torch loop).
3. rerank latency (ms per 64x512-token pairs): 6-layer MiniLM-shaped
   cross-encoder forward, Pallas attention + fused FFN (the query hot loop;
   replaces reference document_reranker.py:231's CPU CrossEncoder.predict).

Timing discipline (axon tunnel: async dispatch, ~8ms/transfer): iterations
are chained inside one lax.scan with a data dependency, and the reported
time is the SLOPE between two scan lengths, so fixed dispatch+fetch
overhead cancels. Variance discipline (VERDICT r4 #4 — the unflagged
r02->r03 1.26M->741k swing): every metric is the MEDIAN of >=5 slope reps
with the IQR reported alongside, plus the jax.profiler device time per
iteration (XLA-Modules line of the /device plane), so a round-over-round
swing is attributable in one read: wide IQR = tunnel/host noise, shifted
device_us = a real kernel regression.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...,
"reps", "iqr", "device_us", "extra_metrics": [...]}.
"""

import json
import sys
import time

import numpy as np

BASELINE_QPS = 50_000.0          # BASELINE.md serving target
BASELINE_ENCODE_CPS = 3_300.0    # round-1 measured chunks/s/chip (s=512)
TARGET_RERANK_MS = 25.0          # VERDICT r1 #4 target for 64x512 pairs
REPS = 5


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


class Measure:
    """Per-iteration seconds: median slope over REPS, IQR, device time."""

    __slots__ = ("sec", "iqr_sec", "reps", "device_us")

    def __init__(self, sec, iqr_sec, reps, device_us):
        self.sec = sec
        self.iqr_sec = iqr_sec
        self.reps = reps
        self.device_us = device_us

    def fields(self) -> dict:
        """The variance-attribution fields every emitted metric carries."""
        out = {"reps": self.reps, "iqr": round(self.iqr_sec * 1e3, 4)}
        if self.device_us is not None:
            out["device_us"] = round(self.device_us, 1)
        return out


def _device_us_per_iter(loop_fn, length) -> float | None:
    """Sum of XLA-module device durations for one loop() call, per scan
    iteration. None when no device plane exists (CPU) or parsing fails."""
    import glob
    import tempfile

    import jax

    try:
        d = tempfile.mkdtemp(prefix="benchprof_")
        jax.profiler.start_trace(d)
        try:
            _ = float(loop_fn())
        finally:
            jax.profiler.stop_trace()
        files = glob.glob(d + "/**/*.xplane.pb", recursive=True)
        if not files:
            return None
        with open(files[0], "rb") as f:
            pd = jax.profiler.ProfileData.from_serialized_xspace(f.read())
        total_ns = 0
        for plane in pd.planes:
            if not plane.name.startswith("/device:"):
                continue
            for line in plane.lines:
                if line.name == "XLA Modules":
                    total_ns += sum(e.duration_ns for e in line.events)
        if total_ns <= 0:
            return None
        return total_ns / 1e3 / length
    except Exception as e:  # profiling must never sink the bench
        log(f"device-time capture failed: {e!r}")
        return None


def slope_time(make_loop, iters_a: int, iters_b: int,
               reps: int = REPS) -> Measure:
    """Seconds per iteration: median over `reps` slopes between two scan
    lengths, with IQR and profiler device time."""
    loops = {length: make_loop(length) for length in (iters_a, iters_b)}
    for length in (iters_a, iters_b):
        _ = float(loops[length]())  # compile + warm
    slopes = []
    for _ in range(reps):
        t = {}
        for length in (iters_a, iters_b):
            t0 = time.time()
            _ = float(loops[length]())
            t[length] = time.time() - t0
        slopes.append(max((t[iters_b] - t[iters_a]) / (iters_b - iters_a),
                          1e-9))
    q1, med, q3 = (float(x) for x in np.percentile(slopes, [25, 50, 75]))
    dev = _device_us_per_iter(loops[iters_b], iters_b)
    return Measure(med, q3 - q1, reps, dev)


def bench_search(jax, jnp, on_tpu):
    from financial_rag_tpu.ops.topk import packed_topk_fused, topk_matmul_reference

    nq, n, d, k = 128, 102_400, 384, 24
    if not on_tpu:
        n = 8_192  # CPU smoke mode

    rng = np.random.default_rng(0)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    xd = jnp.asarray(x, jnp.bfloat16)
    qd = jnp.asarray(q)
    vd = jnp.asarray(np.ones(n, np.float32))

    if on_tpu:
        # the serving default (FlatIndex pallas_fused, float corpus):
        # packed score+tile running max, top-2 per bucket (ops/topk.py)
        raw = lambda qq: packed_topk_fused(qq, xd, vd, k, interpret=False)  # noqa: E731
    else:
        raw = lambda qq: topk_matmul_reference(qq, xd, vd, k)  # noqa: E731

    def chained(q_carry, _):
        s_, i_ = raw(q_carry)
        return q_carry + 0.0 * s_[0, 0], None

    def make_loop(length):
        loop = jax.jit(lambda q0: jax.lax.scan(chained, q0, None, length=length)[0])
        return lambda: jnp.sum(loop(qd))

    iters = (100, 500) if on_tpu else (5, 15)
    m = slope_time(make_loop, *iters)
    dt = m.sec
    qps = nq / dt

    s, i = jax.jit(raw)(qd)
    sref = q @ x.T
    order = np.argsort(-sref, axis=1, kind="stable")[:, :k]
    got = np.asarray(i)
    recall = float(np.mean([len(set(a) & set(b)) / k for a, b in zip(got, order)]))
    log(f"search: {dt * 1e3:.3f} ms/batch of {nq} (iqr {m.iqr_sec * 1e3:.3f}, "
        f"device {m.device_us or 0:.0f} us) -> {qps:,.0f} QPS, recall@{k}={recall:.4f}")
    return qps, m, recall, n, nq, k


def bench_ivf(jax, jnp, on_tpu):
    """IVF (Pallas fused probe kernel) at 262k chunks, auto-tuned nprobe.

    Clustered corpus (mixture on the sphere — text embeddings cluster;
    uniform random corpora make IVF recall degenerate to nprobe/nlist by
    construction). Recall is measured against the index's own exhaustive
    sweep (nprobe=nlist), isolating the quantization loss nprobe controls.
    """
    from financial_rag_tpu.index.ivf import IVFIndex, recommended_nlist
    from financial_rag_tpu.utils.benchgen import clustered_corpus

    # 262k keeps the driver capture fast (~2 min: ingest + train + tune);
    # the 1M/4M/10M scale evidence lives in BENCH_SCALE.json
    n = 262_144 if on_tpu else 8_192
    d = 384
    rng = np.random.default_rng(7)
    x, q = clustered_corpus(rng, n, d, 128)

    nlist = recommended_nlist(n)
    idx = IVFIndex(dim=d, nlist=nlist, list_size=max((n // nlist) * 2, 256),
                   nprobe=32, name="bench_ivf")
    idx.train(x[rng.choice(n, size=min(n, 65_536), replace=False)], iters=8)
    step = 65_536
    for lo in range(0, n, step):
        idx.upsert(np.arange(lo + 1, lo + 1 + len(x[lo:lo + step]), dtype=np.int64),
                   x[lo: lo + step])
    report = idx.tune_nprobe(k=10, target_recall=0.95, queries=q)
    nprobe = report["nprobe"]
    recall = next(s["recall"] for s in report["sweep"] if s["nprobe"] == nprobe)

    idx.search(q[:16], 10, nprobe=nprobe)  # prime compiled fn
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

    iters = (100, 500) if on_tpu else (3, 9)
    m = slope_time(make_loop, *iters)
    dt = m.sec
    qps = 16 / dt
    log(f"ivf: {dt * 1e3:.3f} ms/16q @ {n//1000}k (nprobe={nprobe} tuned, "
        f"nlist={nlist}) -> {qps:,.0f} QPS, recall@10={recall:.4f}")
    return qps, m, nprobe, nlist, recall, n


def bench_encode(jax, jnp, on_tpu):
    from functools import partial

    from financial_rag_tpu.config import ModelConfig
    from financial_rag_tpu.models.bert import bert_encode
    from financial_rag_tpu.models.checkpoint import random_params

    cfg = ModelConfig(name="bge-small-shape", hidden_size=384, num_layers=12,
                      num_heads=12, intermediate_size=1536, vocab_size=30522,
                      max_position=512)
    params = random_params(cfg, seed=0)
    B, S = (128, 512) if on_tpu else (8, 128)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(5, 30000, size=(B, S)).astype(np.int32))
    mask = jnp.asarray(np.ones((B, S), np.int32))
    impl = "pallas" if on_tpu else "xla"
    raw = partial(bert_encode, config=cfg, pooling="mean",
                  compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                  attention_impl=impl, use_pallas_pool=on_tpu,
                  use_fused_ffn=on_tpu)

    def chained(carry, _):
        emb = raw(params, ids, mask)
        return carry + 0.0 * emb[0, 0], None

    def make_loop(length):
        loop = jax.jit(lambda c0: jax.lax.scan(chained, c0, None, length=length)[0])
        return lambda: loop(0.0)

    iters = (10, 40) if on_tpu else (2, 6)
    m = slope_time(make_loop, *iters)
    dt = m.sec
    cps = B / dt
    log(f"encode: {dt * 1e3:.2f} ms / {B}x{S} -> {cps:,.0f} chunks/s/chip")
    return cps, m, B, S


def bench_rerank(jax, jnp, on_tpu):
    from functools import partial

    from financial_rag_tpu.config import ModelConfig
    from financial_rag_tpu.models.bert import cross_encoder_forward
    from financial_rag_tpu.models.checkpoint import random_params

    cfg = ModelConfig(name="minilm6-shape", hidden_size=384, num_layers=6,
                      num_heads=12, intermediate_size=1536, vocab_size=30522,
                      max_position=512, num_labels=1)
    params = random_params(cfg, seed=0)
    B, S = (64, 512) if on_tpu else (8, 128)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(5, 30000, size=(B, S)).astype(np.int32))
    mask = jnp.asarray(np.ones((B, S), np.int32))
    types = jnp.asarray(np.zeros((B, S), np.int32))
    raw = partial(cross_encoder_forward, config=cfg,
                  compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                  attention_impl="pallas" if on_tpu else "xla",
                  use_fused_ffn=on_tpu)

    def chained(carry, _):
        logits = raw(params, ids, mask, types)
        return carry + 0.0 * logits[0], None

    def make_loop(length):
        loop = jax.jit(lambda c0: jax.lax.scan(chained, c0, None, length=length)[0])
        return lambda: loop(0.0)

    iters = (10, 40) if on_tpu else (2, 6)
    m = slope_time(make_loop, *iters)
    log(f"rerank: {m.sec * 1e3:.2f} ms / {B}x{S} pairs")
    return m, B, S


def main() -> None:
    import os

    import jax

    # FRAG_PLATFORM=cpu forces the CPU backend for smoke runs (the TPU
    # plugin force-registers itself and ignores a plain JAX_PLATFORMS)
    plat = os.environ.get("FRAG_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    from financial_rag_tpu.models.encoder import setup_compilation_cache

    setup_compilation_cache()
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    log(f"backend={backend} devices={jax.devices()}")

    def with_retries(fn, *args, attempts=3, backoff_s=30.0):
        # the axon tunnel's remote-compile RPC occasionally drops mid-body
        # ("response body closed before all bytes were read"); one such
        # hiccup must not sink the whole driver bench — retry the section.
        # A genuine kernel/code error still raises after `attempts`.
        for i in range(attempts):
            try:
                return fn(*args)
            except Exception as e:  # noqa: BLE001
                if i == attempts - 1:
                    raise
                log(f"bench section {fn.__name__} failed ({e!r}); "
                    f"retrying in {backoff_s:.0f}s")
                time.sleep(backoff_s)

    qps, m_search, recall, n, nq, k = with_retries(bench_search, jax, jnp, on_tpu)
    cps, m_enc, eb, es = with_retries(bench_encode, jax, jnp, on_tpu)
    m_rr, rb, rs = with_retries(bench_rerank, jax, jnp, on_tpu)
    rr_ms = m_rr.sec * 1e3
    ivf_row = None
    try:
        iqps, m_ivf, inprobe, inlist, irecall, in_ = with_retries(
            bench_ivf, jax, jnp, on_tpu)
        ivf_row = {"metric": f"ivf search QPS @ {in_ // 1000}k chunks "
                   f"(nprobe={inprobe} tuned, nlist={inlist})",
                   "value": round(iqps, 1), "unit": "qps",
                   "vs_baseline": round(iqps / BASELINE_QPS, 3),
                   "recall_at_10_vs_exhaustive": round(irecall, 4),
                   **m_ivf.fields()}
    except Exception as e:  # IVF is an extra metric; never sink the bench
        log(f"ivf bench skipped: {e!r}")

    print(json.dumps({
        "metric": f"search QPS @ {n // 1000}k chunks (k={k}, batch={nq}, bf16 corpus)",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
        "recall_at_24_vs_f32_oracle": round(recall, 4),
        "latency_ms_per_batch": round(m_search.sec * 1e3, 3),
        "n_chunks": n,
        "backend": backend,
        **m_search.fields(),
        "extra_metrics": [
            {"metric": f"encode throughput ({eb}x{es}, 12L, "
             f"{'pallas attn bf16' if on_tpu else 'xla f32'})",
             "value": round(cps, 1), "unit": "chunks/s/chip",
             "vs_baseline": round(cps / BASELINE_ENCODE_CPS, 3),
             **m_enc.fields()},
            {"metric": f"rerank latency ({rb}x{rs} pairs, 6L, "
             f"{'pallas+fused bf16' if on_tpu else 'xla f32'})",
             "value": round(rr_ms, 2), "unit": "ms",
             "vs_baseline": round(TARGET_RERANK_MS / rr_ms, 3),
             **m_rr.fields()},
        ] + ([ivf_row] if ivf_row else []),
    }))


if __name__ == "__main__":
    main()
