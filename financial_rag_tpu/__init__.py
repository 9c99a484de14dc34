"""financial_rag_tpu — a TPU-native retrieval framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
hawkai10/Financial-RAG (see SURVEY.md): dual-encoder dense embedding, an
HBM-resident vector index with on-chip top-k, hybrid BM25 fusion,
cross-encoder reranking, parent/child chunked ingestion, and a REST/SSE
serving layer — engineered for TPU meshes rather than a single CPU process.

Layering (bottom-up):
  ops/        Pallas TPU kernels (flash attention, fused pool+normalize, top-k)
  models/     JAX BERT encoder / cross-encoder stacks + checkpoint IO
  tokenizer/  exact WordPiece (host side; C++ fast path in native/)
  index/      device-resident flat + IVF vector indexes
  parallel/   mesh construction and sharded (multi-chip) search
  store/      host-side parent KV store, child metadata, feedback DB
  ingest/     Marker-JSON parsing, two-tier chunker, streaming pipeline
  retrieval/  multi-query dual-encoder retrieval, fusion, BM25, rerank
  llm/        optional LLM hooks (query normalize / answer synthesis)
  serving/    Flask REST + SSE API matching the reference contract
  training/   contrastive fine-tuning of the encoders on a device mesh
"""

from financial_rag_tpu.version import __version__

__all__ = ["__version__"]
