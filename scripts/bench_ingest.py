"""End-to-end ingest throughput: Marker JSON -> chunker -> WordPiece ->
batched dual-encoder device forward -> per-model index upsert.

This is the production ingest loop (SURVEY §7.1-6 "streaming
encode-and-insert that batches children to saturate the MXU"; replaces
the reference's one-text-at-a-time loop, reference pipeline.py:122-143 +
local_embedder.py:160-184). Encoders run the REAL device path with
random-init weights (weights don't change the cost), so the number is
pipeline chunks/s on the chip — compare against scripts/bench_encode.py's
raw encoder ceiling to see the non-encode overhead.

Writes one BENCH-style JSON line (BENCH_INGEST.json artifact).

Measured on the tunneled v5e: ~3.0k children/s/chip (200-child docs;
round-2 was 433, round-1 277). The round-3 jump came from making the
host stages overlap the device encode (ingest_paths: begin doc N+1 /
finish doc N around doc N's in-flight forwards), device-direct index
upserts (encoder output feeds the donated scatter without a host round
trip), one shared C++ batch tokenize for both encoders, and O(text)
chunking (native word counts + carried per-chunk counts instead of
re-scanning accumulated text per sentence).
"""

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

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import argparse
    import tempfile

    from financial_rag_tpu.config import ModelConfig
    from financial_rag_tpu.index.flat import FlatIndex
    from financial_rag_tpu.ingest.pipeline import IngestionPipeline
    from financial_rag_tpu.models.checkpoint import random_params
    from financial_rag_tpu.models.encoder import DualEncoder, Encoder, setup_compilation_cache
    from financial_rag_tpu.store import ChildMetaStore, ParentStore

    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=0, help="0 = backend default")
    ap.add_argument("--out", default="BENCH_INGEST.json")
    args = ap.parse_args()

    setup_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"
    n_docs = args.docs or (13 if on_tpu else 2)

    cfg = ModelConfig(name="bge-small-shape", hidden_size=384, num_layers=12,
                      num_heads=12, intermediate_size=1536, vocab_size=30522,
                      max_position=512)
    params = random_params(cfg, seed=0)
    encoders = {
        "baai": Encoder(cfg, params, pooling="cls", batch_size=128, max_seq_len=512),
        "gte": Encoder(cfg, params, pooling="mean", batch_size=128, max_seq_len=512),
    }
    dual = DualEncoder(encoders)

    # synthetic financial prose: ~55-word sentences pack into ~300-token
    # children (the reference's child budget), several pages per doc
    rng = np.random.default_rng(0)
    words = ("rent lease invoice amount gst tax lessor lessee tenant landlord "
             "credit note payment deposit lock-in period escalation clause "
             "maintenance charges premises quarterly annual agreement renewal "
             "termination notice interest penalty arrears utilities parking").split()

    def page(pg):
        sents = [" ".join(rng.choice(words, size=18)) + "." for _ in range(40)]
        return {"id": f"/page/{pg}/Text/0", "block_type": "Text",
                "html": "<p>" + " ".join(sents) + "</p>"}

    # big documents (~50 pages -> ~200 children) so the encode batches
    # fill the 128-row device bucket and amortize per-dispatch latency
    pages = 50 if on_tpu else 6
    docs = []
    for d in range(n_docs):
        docs.append({"children": [page(p) for p in range(pages)]})

    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        indexes = {name: FlatIndex(dim=384, capacity=1 << 15, name=name)
                   for name in dual.names}
        pipe = IngestionPipeline(dual, ParentStore(tmp / "p.db"),
                                 ChildMetaStore(tmp / "c.db"), indexes)
        paths = []
        for d, doc in enumerate(docs):
            p = tmp / f"doc{d}.json"
            p.write_text(json.dumps(doc))
            paths.append(p)

        pipe.ingest_extracted_json(paths[0], "warmup")   # compile/warm
        pipe.flush()
        warm_children = indexes["baai"].count()

        t0 = time.time()
        pipe.ingest_paths([(p, f"doc{d}") for d, p in enumerate(paths[1:], 1)])
        pipe.flush()   # device sync: count upserts in-flight at loop exit
        dt = time.time() - t0
        total_children = indexes["baai"].count() - warm_children

    cps = total_children / dt
    row = {"metric": "ingest throughput (Marker JSON -> chunk -> tokenize -> "
                     "dual-encoder device encode -> 2x index upsert)",
           "value": round(cps, 1), "unit": "children/s/chip",
           "n_children": int(total_children), "n_docs": n_docs - 1,
           "seconds": round(dt, 2), "backend": jax.default_backend()}
    print(json.dumps(row))
    Path(args.out).write_text(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
