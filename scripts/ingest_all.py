#!/usr/bin/env python
"""Ingest a directory of extraction JSONs and print per-collection counts
(capability of reference ingest_all.py:26-46).

Usage: python scripts/ingest_all.py [--dir "New folder"] [--data-dir .]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="New folder")
    ap.add_argument("--data-dir", default=".")
    args = ap.parse_args()

    from financial_rag_tpu.runtime import Runtime

    rt = Runtime.build(data_dir=args.data_dir)
    results = rt.pipeline.ingest_directory(args.dir)
    ok = [r for r in results if "error" not in r]
    bad = [r for r in results if "error" in r]
    print(f"ingested {len(ok)} documents ({len(bad)} failed)")
    for r in bad:
        print(f"  FAILED {r['document_id']}: {r['error']}")
    for name, idx in rt.indexes.items():
        print(f"collection {idx.name}: {idx.count()} vectors")
    print(f"parents.db: {rt.parent_store.count()} parents")
    rt.save_indexes(args.data_dir)


if __name__ == "__main__":
    main()
