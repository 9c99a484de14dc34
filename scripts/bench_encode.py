#!/usr/bin/env python
"""Encode-throughput benchmark (BASELINE.md: 'encode throughput
(chunks/s/chip)'). Slope timing over scan-chained forwards — see
docs/OPERATIONS.md. Prints one JSON line per configuration.

Usage: python scripts/bench_encode.py [--configs 256x128 128x512]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*", default=["256x128", "128x512"])
    args = ap.parse_args()

    import os

    import jax

    plat = os.environ.get("FRAG_PLATFORM")
    if plat:  # force CPU for smoke runs (plugin ignores plain JAX_PLATFORMS)
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    from financial_rag_tpu.config import ModelConfig
    from financial_rag_tpu.models import bert_encode, random_params
    from financial_rag_tpu.models.encoder import setup_compilation_cache

    setup_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"
    cfg = ModelConfig(name="bge-small")  # 12L/384 flagship architecture
    params = random_params(cfg, seed=0)
    rng = np.random.default_rng(0)

    for spec in args.configs:
        b, s = (int(v) for v in spec.split("x"))
        attn = "pallas" if (on_tpu and s >= 256) else "xla"
        ids0 = jnp.asarray(rng.integers(1, 30000, (b, s)), jnp.int32)
        mask = jnp.ones((b, s), jnp.int32)

        def step(ids, _):
            emb = bert_encode(
                params, ids, mask, config=cfg, pooling="mean",
                compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                attention_impl=attn, use_pallas_pool=on_tpu, use_fused_ffn=on_tpu)
            return ids + (emb[0, 0] * 0).astype(jnp.int32), None

        def timed(length: int) -> float:
            loop = jax.jit(lambda c, L=length: jax.lax.scan(step, c, None, length=L)[0])
            out = loop(ids0)
            _ = float(jnp.sum(out))
            t0 = time.time()
            out = loop(ids0)
            _ = float(jnp.sum(out))
            return time.time() - t0

        la, lb = (3, 13) if on_tpu else (1, 3)
        dt = max((timed(lb) - timed(la)) / (lb - la), 1e-9)
        print(json.dumps({
            "metric": f"encode throughput ({b}x{s}, {attn} attention)",
            "value": round(b / dt, 1),
            "unit": "chunks/s/chip",
            "tokens_per_s": round(b * s / dt),
            "ms_per_batch": round(dt * 1e3, 2),
            "backend": jax.default_backend(),
        }), flush=True)


if __name__ == "__main__":
    main()
