#!/usr/bin/env python
"""Dense-retrieval smoke check (the reference README references a
pc_retrieval_smoke.py that does not exist in its tree — provided here):
embeds a few queries through the dense parent-context path and prints the
top children + parents.

Usage: python scripts/pc_retrieval_smoke.py [--data-dir .] [--queries q1 q2]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_QUERIES = [
    "What is the total invoice amount?",
    "What is the GST amount?",
    "credit note number and date",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=".")
    ap.add_argument("--queries", nargs="*", default=DEFAULT_QUERIES)
    ap.add_argument("--top-k", type=int, default=8)
    args = ap.parse_args()

    from financial_rag_tpu.runtime import Runtime

    rt = Runtime.build(data_dir=args.data_dir)
    counts = {n: i.count() for n, i in rt.indexes.items()}
    print(f"collections: {counts}")
    if not any(counts.values()):
        print("indexes are empty — run scripts/ingest_all.py first")
        return

    for q in args.queries:
        out = rt.dense_retriever.query(q, top_k=args.top_k, dedup_parents=4)
        print(f"\nQ: {q}")
        for hit in out["child_hits"][:5]:
            print(f"  child {hit['child_id']} rrf={hit['rrf_score']:.4f} "
                  f"{(hit['snippet'] or '')[:90]!r}")
        for p in out["parent_contexts"]:
            print(f"  parent {p['parent_id']} doc={p['document_id']} "
                  f"pages {p['page_start']}-{p['page_end']}")


if __name__ == "__main__":
    main()
