#!/usr/bin/env python
"""Download the three checkpoints (bge-small, gte-small, MiniLM cross-encoder)
from the HuggingFace hub into local_models/ (the reference references a
download_cross_encoder.py that does not exist in its tree).

Requires network access; in air-gapped deployments copy the HF model
directories manually and point EMBED_BAAI_PATH / EMBED_GTE_PATH /
CROSS_ENCODER_PATH at them.

Usage: python scripts/download_models.py [--dest local_models]
"""

import argparse
from pathlib import Path

MODELS = {
    "BAAI-bge-small-en-v1.5": "BAAI/bge-small-en-v1.5",
    "thenlper-gte-small": "thenlper/gte-small",
    "cross-encoder-ms-marco-MiniLM-L-6-v2": "cross-encoder/ms-marco-MiniLM-L-6-v2",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", default="local_models")
    args = ap.parse_args()
    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        raise SystemExit("huggingface_hub is required (pip install huggingface_hub)")

    dest = Path(args.dest)
    for local_name, repo_id in MODELS.items():
        out = dest / local_name
        print(f"downloading {repo_id} -> {out}")
        snapshot_download(repo_id, local_dir=out,
                          allow_patterns=["*.json", "*.safetensors", "vocab.txt"])
    print("done. Set:")
    print(f"  EMBED_BAAI_PATH={dest}/BAAI-bge-small-en-v1.5")
    print(f"  EMBED_GTE_PATH={dest}/thenlper-gte-small")
    print(f"  CROSS_ENCODER_PATH={dest}/cross-encoder-ms-marco-MiniLM-L-6-v2")


if __name__ == "__main__":
    main()
