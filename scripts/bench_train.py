"""Contrastive train-step throughput (scan-chained slope timing).

Runs the dp x tp training step (training/contrastive.py) over a
(n_devices, 1) mesh — data-parallel across every visible chip, model
axis 1 (tensor-parallel training falls back to XLA attention by policy,
see models/bert.resolve_attention_impl). Timing reuses bench.py's
slope_time: steps chain inside one lax.scan and the reported time is the
slope between two lengths — block_until_ready does NOT actually block on
this environment's tunneled backend (measured 0.33ms for a true 202ms
step), so only a host materialization (float()) is a trustworthy fence.

Writes one BENCH-style JSON line (BENCH_TRAIN.json artifact).
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

plat = os.environ.get("FRAG_PLATFORM")
if plat:
    jax.config.update("jax_platforms", plat)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from bench import slope_time
from financial_rag_tpu.config import ModelConfig
from financial_rag_tpu.models.bert import resolve_attention_impl
from financial_rag_tpu.models.checkpoint import random_params
from financial_rag_tpu.models.encoder import setup_compilation_cache
from financial_rag_tpu.training.contrastive import make_train_step


def main():
    setup_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"
    cfg = ModelConfig(name="bge-small-shape", hidden_size=384, num_layers=12,
                      num_heads=12, intermediate_size=1536, vocab_size=30522,
                      max_position=512)
    devices = jax.devices()
    mesh = Mesh(np.array(devices).reshape(len(devices), 1), ("data", "model"))
    B, S = (256 * len(devices), 128) if on_tpu else (16, 64)
    impl = resolve_attention_impl()  # pallas on TPU (XLA bwd OOMs), xla off-TPU
    step, init_state = make_train_step(cfg, mesh, compute_dtype=jnp.bfloat16,
                                       attention_impl=impl)
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
            (p, o, loss), _ = jax.lax.scan(
                chained, (params, opt_state, jnp.float32(0)), None, length=length)
            return loss

        loop = jax.jit(body)
        return lambda: float(loop(params, opt_state, batch))

    with mesh:
        per_step = slope_time(make_loop, 3, 13).sec
    print(json.dumps({
        "metric": (f"contrastive train step ({B}x2x{S} pairs, 12L bf16, "
                   f"{impl} attn, dp={len(devices)})"),
        "value": round(per_step * 1e3, 2), "unit": "ms",
        "pairs_per_s": round(B / per_step, 1),
        "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
