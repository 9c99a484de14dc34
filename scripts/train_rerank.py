"""Reranker fine-tuning from feedback — training + uplift benchmark.

Two modes:

- default (synthetic uplift measure): fine-tune a randomly-initialized
  production-shape cross-encoder (MiniLM geometry: 6L, h384) with the
  listwise loss on the zero-lexical-overlap task and report held-out
  rank-1 accuracy before/after through the REAL serving scorer
  (retrieval/rerank.CrossEncoderModel.predict). Appends one JSON line to
  BENCH_TRAIN.json.

- --feedback-db PATH: mine (query, passage, label) triples from real user
  feedback (ratings joined with the engine's result cache,
  store/feedback_db.rated_results) and fine-tune the checkpoint at
  --model-path on them; --out-dir writes a checkpoint directory
  (config.json + model.npz) that RERANK_MODEL_PATH loads directly.

The reference stores feedback (feedback_database.py) but never uses it;
its reranker is a frozen off-the-shelf MiniLM (document_reranker.py:39-71).
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
import optax
from jax.sharding import Mesh

from financial_rag_tpu.config import ModelConfig
from financial_rag_tpu.models.encoder import setup_compilation_cache
from financial_rag_tpu.training.rerank_ft import (
    ListwiseBatcher,
    make_rerank_train_step,
    measure_rerank_uplift,
    mine_feedback_triples,
    save_finetuned,
    triples_to_groups,
)


def finetune_from_feedback(args, cfg, mesh, on_tpu):
    from financial_rag_tpu.models.checkpoint import load_params, random_params
    from financial_rag_tpu.store.feedback_db import FeedbackDatabase

    db = FeedbackDatabase(args.feedback_db)
    triples = mine_feedback_triples(db)
    groups = triples_to_groups(triples, group_size=args.group, seed=0)
    if not groups:
        print(json.dumps({"error": "no rated feedback with cached results to mine"}))
        return 1
    if args.model_path:
        params, cfg = load_params(args.model_path, fallback_seed=0)
    else:
        params = random_params(cfg, seed=0)
    step, init_state = make_rerank_train_step(
        cfg, mesh, optimizer=optax.adamw(args.lr),
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    params, opt_state = init_state(params)
    batcher = ListwiseBatcher(max_seq_len=args.seq)
    losses, done, epoch = [], 0, 0
    while done < args.steps:
        for batch in batcher.batches(groups, min(args.batch, len(groups)),
                                     shuffle_seed=epoch):
            params, opt_state, loss = step(
                params, opt_state, {k: jnp.asarray(v) for k, v in batch.items()})
            losses.append(float(loss))
            done += 1
            if done >= args.steps:
                break
        epoch += 1
    out = save_finetuned(params, cfg, args.out_dir)
    print(json.dumps({
        "mode": "feedback", "triples": len(triples), "groups": len(groups),
        "steps": done, "loss_first": round(losses[0], 4),
        "loss_last": round(losses[-1], 4), "checkpoint": str(out),
        "backend": jax.default_backend(),
    }))
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--group", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seq", type=int, default=64)
    ap.add_argument("--concepts", type=int, default=64)
    ap.add_argument("--train", type=int, default=1024)
    ap.add_argument("--eval", type=int, default=192)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--hidden", type=int, default=384)
    ap.add_argument("--feedback-db", default=None,
                    help="fine-tune on mined user feedback instead of the synthetic measure")
    ap.add_argument("--model-path", default=None,
                    help="checkpoint dir to start from (feedback mode)")
    ap.add_argument("--out-dir", default="rerank_finetuned",
                    help="checkpoint dir to write (feedback mode)")
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent
                                         / "BENCH_TRAIN.json"))
    args = ap.parse_args()

    setup_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"
    cfg = ModelConfig(name="minilm-ce-shape", hidden_size=args.hidden,
                      num_layers=args.layers,
                      num_heads=max(args.hidden // 32, 4),
                      intermediate_size=args.hidden * 4, vocab_size=30522,
                      max_position=512, num_labels=1)
    devices = jax.devices()
    mesh = Mesh(np.array(devices).reshape(len(devices), 1), ("data", "model"))

    if args.feedback_db:
        sys.exit(finetune_from_feedback(args, cfg, mesh, on_tpu))

    t0 = time.time()
    rep, _ = measure_rerank_uplift(
        cfg, mesh, steps=args.steps, batch_size=args.batch,
        group_size=args.group, lr=args.lr, seq_len=args.seq,
        n_concepts=args.concepts, n_train=args.train, n_eval=args.eval,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    rep = {
        "metric": (f"held-out rank-1 accuracy uplift from listwise reranker "
                   f"fine-tuning ({args.layers}L random init, {args.steps} "
                   f"steps, group={args.group})"),
        "value": round(rep["rank1_after"] - rep["rank1_before"], 4),
        "unit": "rank1_accuracy",
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
