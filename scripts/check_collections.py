#!/usr/bin/env python
"""Print per-model collection counts + parent count
(capability of reference check_collections.py:12-37).

Usage: python scripts/check_collections.py [--data-dir .]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=".")
    args = ap.parse_args()

    from financial_rag_tpu.runtime import Runtime

    rt = Runtime.build(data_dir=args.data_dir)
    for name, idx in rt.indexes.items():
        print(f"{idx.name}: {idx.count()} vectors (capacity {idx.capacity}, "
              f"backend {idx.backend})")
    print(f"parents.db: {rt.parent_store.count()} parents")
    print(f"children_meta.db: {rt.child_meta.count()} children")


if __name__ == "__main__":
    main()
