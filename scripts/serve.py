#!/usr/bin/env python
"""Start the search API server (capability of reference api_server.py
__main__: optional auto-ingest daemon + threaded HTTP server).

Usage: python scripts/serve.py [--data-dir DIR] [--port 5000] [--auto-ingest]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=".")
    ap.add_argument("--host", default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--auto-ingest", action="store_true")
    args = ap.parse_args()

    from financial_rag_tpu.runtime import Runtime
    from financial_rag_tpu.serving.app import run_server

    rt = Runtime.build(data_dir=args.data_dir)
    processor = rt.make_processor(args.data_dir)
    if args.auto_ingest or rt.config.ingest.auto_ingest:
        processor.start()
    app = rt.make_app(processor=processor, data_dir=args.data_dir)
    host = args.host or rt.config.serving.host
    port = args.port or rt.config.serving.port
    print(f"serving on http://{host}:{port} "
          f"(indexes: { {n: i.count() for n, i in rt.indexes.items()} })")
    run_server(app, host=host, port=port)


if __name__ == "__main__":
    main()
