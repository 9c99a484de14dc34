"""Training -> retrieval uplift benchmark (VERDICT r3 #3).

Fine-tunes a randomly-initialized production-shape encoder (bge-small
geometry: 12L, h384) on the synthetic paraphrase task — disjoint surface
vocabularies expressing shared latent concepts, so lexical matching scores
at chance and ONLY a learned query/document alignment can retrieve — and
reports held-out recall@10 before/after, evaluated through the framework's
own serving path (Encoder forward -> FlatIndex exact sweep).

Appends one JSON line to BENCH_TRAIN.json. The reference has no training
path at all (SURVEY.md §5.4), so this measures the framework's headline
beyond-reference capability as a retrieval outcome, not a loss curve.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

plat = os.environ.get("FRAG_PLATFORM")
if plat:
    jax.config.update("jax_platforms", plat)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from financial_rag_tpu.config import ModelConfig
from financial_rag_tpu.models.encoder import setup_compilation_cache
from financial_rag_tpu.training.uplift import measure_retrieval_uplift


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seq", type=int, default=32)
    ap.add_argument("--concepts", type=int, default=64)
    ap.add_argument("--train", type=int, default=2048)
    ap.add_argument("--eval", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--hidden", type=int, default=384)
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent
                                         / "BENCH_TRAIN.json"))
    args = ap.parse_args()

    setup_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"
    cfg = ModelConfig(name="bge-small-shape", hidden_size=args.hidden,
                      num_layers=args.layers,
                      num_heads=max(args.hidden // 32, 4),
                      intermediate_size=args.hidden * 4, vocab_size=30522,
                      max_position=512)
    devices = jax.devices()
    mesh = Mesh(np.array(devices).reshape(len(devices), 1), ("data", "model"))

    t0 = time.time()
    rep = measure_retrieval_uplift(
        cfg, mesh, steps=args.steps, batch_size=args.batch, lr=args.lr,
        seq_len=args.seq, k=args.k, n_concepts=args.concepts,
        n_train=args.train, n_eval=args.eval,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    rep = {
        "metric": (f"held-out recall@{args.k} uplift from contrastive "
                   f"fine-tuning ({args.layers}L random init, "
                   f"{args.steps} steps)"),
        "value": rep["uplift"],
        "unit": "recall",
        "backend": jax.default_backend(),
        "wall_s": round(time.time() - t0, 1),
        **rep,
    }
    line = json.dumps(rep)
    print(line)
    with open(args.out, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
