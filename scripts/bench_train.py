"""Contrastive train-step throughput (scan-chained slope timing).

The dp x tp training step (training/contrastive.py) on however many chips
are visible, timed by chaining steps inside one lax.scan and taking the
slope between two lengths — block_until_ready does NOT actually block on
this environment's tunneled backend (measured 0.33ms/"step" vs the true
202ms), so only a host materialization (float()) is a trustworthy fence.

Writes one BENCH-style JSON line (BENCH_TRAIN.json artifact).
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

plat = os.environ.get("FRAG_PLATFORM")
if plat:
    jax.config.update("jax_platforms", plat)

import json, time
import numpy as np, jax.numpy as jnp
from jax.sharding import Mesh
from financial_rag_tpu.config import ModelConfig
from financial_rag_tpu.models.checkpoint import random_params
from financial_rag_tpu.training.contrastive import make_train_step
from financial_rag_tpu.models.encoder import setup_compilation_cache
setup_compilation_cache()
cfg = ModelConfig(name="bge-small-shape", hidden_size=384, num_layers=12,
                  num_heads=12, intermediate_size=1536, vocab_size=30522,
                  max_position=512)
mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
B, S = (256, 128) if jax.default_backend() == 'tpu' else (16, 64)
step, init_state = make_train_step(cfg, mesh, compute_dtype=jnp.bfloat16,
                                   attention_impl="pallas")
params = random_params(cfg, seed=0)
params, opt_state = init_state(params)
rng = np.random.default_rng(0)
batch = {k: jnp.asarray(rng.integers(5, 30000, size=(B, S)).astype(np.int32))
         if k.endswith("ids") else jnp.asarray(np.ones((B, S), np.int32))
         for k in ("q_ids", "q_mask", "d_ids", "d_mask")}

def make_loop(length):
    def body(params, opt_state, batch):
        def chained(carry, _):
            p, o, _ = carry
            p, o, loss = step(p, o, batch)
            return (p, o, loss), None
        (p, o, loss), _ = jax.lax.scan(chained, (params, opt_state, jnp.float32(0)), None, length=length)
        return loss
    loop = jax.jit(body)
    return lambda: float(loop(params, opt_state, batch))

with mesh:
    t = {}
    for length in (3, 13):
        loop = make_loop(length)
        _ = loop()  # compile
        t0 = time.time(); _ = loop(); t[length] = time.time() - t0
per_step = (t[13] - t[3]) / 10
print(json.dumps({
    "metric": f"contrastive train step ({B}x2x{S} pairs, 12L bf16, pallas attn + fused-FFN VJP)",
    "value": round(per_step * 1e3, 2), "unit": "ms",
    "pairs_per_s": round(B / per_step, 1), "backend": jax.default_backend()}))
