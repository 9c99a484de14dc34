"""Typed configuration tree for the whole framework.

The reference scatters ~40 ad-hoc environment variables across modules
(see SURVEY.md §5.6; e.g. reference chunker.py:52-68, retriever.py:30-34,
chroma_child_store.py:23-30). Here every knob lives in one dataclass tree;
each field can still be overridden by an environment variable so existing
deployment habits keep working.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional


def _env(name: str, default, cast=None):
    raw = os.environ.get(name)
    if raw is None:
        return default
    if cast is bool:
        return raw.strip().lower() in ("1", "true", "yes", "on")
    if cast is not None:
        return cast(raw)
    if isinstance(default, bool):
        return raw.strip().lower() in ("1", "true", "yes", "on")
    if isinstance(default, int):
        return int(raw)
    if isinstance(default, float):
        return float(raw)
    return raw


@dataclass
class ChunkingConfig:
    """Two-tier parent/child chunking (reference parent_child_chunker.py:52-68)."""

    parent_max_tokens: int = field(default_factory=lambda: _env("PARENT_MAX_TOKENS", 1500))
    child_max_tokens: int = field(default_factory=lambda: _env("CHILD_MAX_TOKENS", 300))
    child_overlap_words: int = field(default_factory=lambda: _env("CHILD_OVERLAP", 80))
    # heuristic token estimate multiplier (words * 1.3) used by the reference
    token_per_word: float = 1.3


@dataclass
class ModelConfig:
    """One encoder checkpoint."""

    name: str = "baai-bge-small-en-v1.5"
    path: Optional[str] = None          # directory containing config.json / model.safetensors
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 1536
    vocab_size: int = 30522
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    # classification head on top of [CLS] (cross-encoder reranker)
    num_labels: int = 0

    @classmethod
    def from_json(cls, path: str | Path, name: Optional[str] = None) -> "ModelConfig":
        """Build from a HuggingFace-style config.json directory."""
        p = Path(path)
        cfg_file = p / "config.json" if p.is_dir() else p
        with open(cfg_file) as f:
            raw = json.load(f)
        return cls(
            name=name or p.name,
            path=str(p if p.is_dir() else p.parent),
            hidden_size=raw.get("hidden_size", 384),
            num_layers=raw.get("num_hidden_layers", 12),
            num_heads=raw.get("num_attention_heads", 12),
            intermediate_size=raw.get("intermediate_size", 1536),
            vocab_size=raw.get("vocab_size", 30522),
            max_position=raw.get("max_position_embeddings", 512),
            type_vocab_size=raw.get("type_vocab_size", 2),
            layer_norm_eps=raw.get("layer_norm_eps", 1e-12),
            num_labels=len(raw.get("id2label", {})) if "BertForSequenceClassification" in raw.get("architectures", []) else 0,
        )


@dataclass
class EncoderEnsembleConfig:
    """Dual-encoder ensemble (reference retriever.py:26-57)."""

    baai_path: Optional[str] = field(default_factory=lambda: _env("EMBED_BAAI_PATH", None, str))
    gte_path: Optional[str] = field(default_factory=lambda: _env("EMBED_GTE_PATH", None, str))
    baai_name: str = field(default_factory=lambda: _env("EMBED_BAAI_NAME", "baai-bge-small-en-v1.5"))
    gte_name: str = field(default_factory=lambda: _env("EMBED_GTE_NAME", "thenlper-gte-small"))
    # fused single-vector mode weights (dormant reference path chunker.py:252-260)
    fused_weights: tuple = (0.6, 0.4)
    encode_batch_size: int = field(default_factory=lambda: _env("ENCODE_BATCH_SIZE", 256))
    max_seq_len: int = field(default_factory=lambda: _env("ENCODE_MAX_SEQ_LEN", 512))


@dataclass
class IndexConfig:
    """Device-resident vector index."""

    kind: str = field(default_factory=lambda: _env("INDEX_KIND", "flat"))  # flat | ivf
    dim: int = 384
    # 0 = auto: flat indexes start at one kernel tile (1024) and double on
    # demand; IVF/sharded sizing plans for ~131k vectors. An explicit value
    # (env INDEX_CAPACITY or set programmatically — both honored, ADVICE r2)
    # preallocates, which a large planned ingest should do up front: growth
    # doublings transiently hold old+new buffers (~3x a doubling step).
    capacity: int = field(default_factory=lambda: _env("INDEX_CAPACITY", 0))

    @property
    def planned_capacity(self) -> int:
        """Capacity for sizing decisions (IVF nlist/list_size, per-shard
        allocation): the explicit value, or the ~131k planning default."""
        return self.capacity or (1 << 17)
    dtype: str = field(default_factory=lambda: _env("INDEX_DTYPE", "bfloat16"))
    # IVF (nlist 0 = auto: power-of-two ≈ 4·sqrt(capacity), see
    # index/ivf.recommended_nlist)
    ivf_nlist: int = field(default_factory=lambda: _env("IVF_NLIST", 0))
    ivf_nprobe: int = field(default_factory=lambda: _env("IVF_NPROBE", 64))
    ivf_kmeans_iters: int = field(default_factory=lambda: _env("IVF_KMEANS_ITERS", 12))
    # after each ingest sweep, auto-tune nprobe to the smallest value whose
    # recall@10 vs an exhaustive sweep meets this target (0 = disabled)
    ivf_autotune_recall: float = field(default_factory=lambda: _env("IVF_AUTOTUNE_RECALL", 0.0))
    ivf_autotune_sample: int = field(default_factory=lambda: _env("IVF_AUTOTUNE_SAMPLE", 256))
    # OOD safety margin (index/tuning.py): after tuning, double nprobe until
    # a worst-case SHIFTED query sample also clears the target — protects a
    # drifting query workload from the tuned point's recall cliff at the
    # cost of some of the tuning speedup (scripts/bench_ivf_ood.py measures)
    ivf_tune_ood_guard: bool = field(default_factory=lambda: _env("IVF_TUNE_OOD_GUARD", False))
    persist_dir: str = field(default_factory=lambda: _env("INDEX_PERSIST_DIR", ".tpu_index"))
    collection_prefix: str = field(default_factory=lambda: _env("CHILD_VECTOR_COLLECTION", "children"))


@dataclass
class FusionConfig:
    """Score fusion (reference rag_backend.py:722-795)."""

    method: str = field(default_factory=lambda: _env("ENSEMBLE_FUSION", "rrf"))  # rrf | avg
    rrf_k: int = field(default_factory=lambda: _env("ENSEMBLE_RRF_K", 60))
    bm25_weight: float = field(default_factory=lambda: _env("BM25_WEIGHT", 0.3))
    dense_weight: float = field(default_factory=lambda: _env("DENSE_WEIGHT", 0.7))
    candidates: int = field(default_factory=lambda: _env("RETRIEVE_CANDIDATES", 24))
    per_query_k: int = field(default_factory=lambda: _env("PER_QUERY_K", 24))


@dataclass
class RerankConfig:
    """Cross-encoder rerank (reference document_reranker.py:125-304)."""

    enabled: bool = field(default_factory=lambda: _env("RERANK_ENABLED", True))
    model_path: Optional[str] = field(default_factory=lambda: _env("CROSS_ENCODER_PATH", None, str))
    model_name: str = field(default_factory=lambda: _env("CROSS_ENCODER_MODEL", "cross-encoder-ms-marco-MiniLM-L-6-v2"))
    max_pairs: int = field(default_factory=lambda: _env("RERANK_MAX_PAIRS", 64))
    max_seq_len: int = 512
    cross_weight: float = 0.8
    retrieval_weight: float = 0.2


@dataclass
class RetrievalConfig:
    top_children: int = field(default_factory=lambda: _env("TOP_CHILDREN", 24))
    top_parents: int = field(default_factory=lambda: _env("TOP_PARENTS", 3))
    dedup_parents: int = field(default_factory=lambda: _env("DEDUP_PARENTS", 4))
    multivector_enabled: bool = field(default_factory=lambda: _env("CHILD_USE_MULTIVECTOR", False))
    hitk_expect_contains: Optional[str] = field(default_factory=lambda: _env("HITK_EXPECT_CONTAINS", None, str))
    hitk_k: int = field(default_factory=lambda: _env("HITK_K", 10))


@dataclass
class MeshConfig:
    """Device mesh for sharded search / training (new design; SURVEY.md §2.5-2.6)."""

    data_axis: str = "data"
    shard_axis: str = "shard"   # corpus axis for index sharding
    model_axis: str = "model"   # tensor-parallel axis for training
    index_shards: int = field(default_factory=lambda: _env("INDEX_SHARDS", 0))  # 0 = all devices
    # devices for data-parallel encode (ingest/query batches shard_map'd
    # across a "data" mesh; 0/1 = single-device encode)
    encode_dp: int = field(default_factory=lambda: _env("ENCODE_DP", 0))


@dataclass
class LLMConfig:
    """Optional LLM hooks; degrade gracefully without a key (reference rag_backend.py:554-557)."""

    provider: str = field(default_factory=lambda: _env("LLM_PROVIDER", "gemini"))
    gemini_api_key: Optional[str] = field(default_factory=lambda: _env("GEMINI_API_KEY", None, str))
    gemini_api_url: str = field(default_factory=lambda: _env(
        "GEMINI_API_URL",
        "https://generativelanguage.googleapis.com/v1beta/models/gemini-2.0-flash:generateContent"))
    retries: int = 3
    retry_sleep_s: float = 1.0
    timeout_s: float = 30.0
    chunk_context_enabled: bool = field(default_factory=lambda: _env("CHUNK_CONTEXT_ENABLED", False))
    # on-device answer synthesis (llm/local_llm.py): a HF Qwen2/Llama-family
    # checkpoint directory; LLM_PROVIDER=local selects it
    local_checkpoint: Optional[str] = field(default_factory=lambda: _env("LLM_CHECKPOINT", None, str))
    local_max_new_tokens: int = field(default_factory=lambda: _env("LLM_MAX_NEW_TOKENS", 256, int))
    # "bfloat16" | "int8" (weight-only, ~2x decode bandwidth) | "float32"
    local_dtype: str = field(default_factory=lambda: _env("LLM_DTYPE", "bfloat16", str))
    # prompt-lookup speculative decoding: tokens drafted per step for
    # batch-1 greedy generation (0 disables). Greedy-equivalent; RAG
    # answers quote retrieved context, so drafts hit often (decoder.py).
    local_spec_k: int = field(default_factory=lambda: _env("LLM_SPEC_K", 7, int))
    # continuous batching for concurrent answer STREAMS (llm/continuous.py):
    # engine batch rows (0 disables) and the shared decode window in cache
    # slots (bounds admissible per-request max_tokens). The engine engages
    # only above the serving direct-lane threshold, so single-stream
    # behavior (speculative batch-1) is untouched.
    local_continuous_rows: int = field(default_factory=lambda: _env("LLM_CONTINUOUS_ROWS", 8, int))
    local_continuous_window: int = field(default_factory=lambda: _env("LLM_CONTINUOUS_WINDOW", 2048, int))
    # prompt-lookup drafts per continuous-engine dispatch (0 = plain greedy
    # segments): each joined stream emits 1..k+1 tokens per shared verify
    # step instead of exactly 1 (llm/continuous.py speculative blocks)
    local_continuous_spec_k: int = field(default_factory=lambda: _env("LLM_CONTINUOUS_SPEC_K", 7, int))


@dataclass
class IngestConfig:
    source_dir: str = field(default_factory=lambda: _env("SOURCE_DOCUMENTS_DIR", "Source_Documents"))
    extracted_dir: str = field(default_factory=lambda: _env("EXTRACTED_DIR", "New folder"))
    chunk_logs_dir: str = field(default_factory=lambda: _env("CHUNK_LOGS_DIR", "chunk_logs"))
    state_path: str = field(default_factory=lambda: _env("PROCESSING_STATE_PATH", ".processing_state.json"))
    auto_ingest: bool = field(default_factory=lambda: _env("AUTO_INGEST_ON_STARTUP", False))


@dataclass
class ServingConfig:
    host: str = field(default_factory=lambda: _env("API_HOST", "0.0.0.0"))
    port: int = field(default_factory=lambda: _env("API_PORT", 5000))
    request_timeout_s: float = field(default_factory=lambda: _env("REQUEST_TIMEOUT_S", 120.0))
    sse_inter_event_delay_s: float = field(default_factory=lambda: _env("SSE_DELAY_S", 0.0))
    max_query_len: int = 1000
    result_cache_ttl_s: float = 3600.0
    # cadence of the system-performance recorder (cpu/mem/qpm/error-rate ->
    # feedback db, reference feedback_database.py:673-694); 0 disables
    sysperf_interval_s: float = field(default_factory=lambda: _env("SYSPERF_INTERVAL_S", 60.0))
    # cross-request micro-batching of encode + index sweeps (serving/batcher.py):
    # concurrent requests coalesce into single device calls. Batching is
    # contention-based (whatever queued while the previous fused call was in
    # flight forms the next batch); microbatch_wait_ms=0 means NO artificial
    # gather wait — the timed wait was a measured regression (round 2:
    # 0.589x QPS, p95 4.3x) and exists only as an opt-in knob.
    # ON by default since round 3: the adaptive bypass IS thread-per-request
    # at concurrency <= microbatch_direct, and coalesces only the overflow —
    # measured never-a-regression at low load and 1.9x at 64 threads
    # (BENCH_SERVING.json). SERVE_MICROBATCH=0 restores pure per-request.
    microbatch: bool = field(default_factory=lambda: _env("SERVE_MICROBATCH", True))
    microbatch_wait_ms: float = field(default_factory=lambda: _env("MICROBATCH_WAIT_MS", 0.0))
    # fused-batch row cap: one STATIC padded shape (batcher._pad_to_bucket).
    # Swept on the tunneled v5e: the sweep's cost is corpus streaming, so
    # query-rows/s GROWS with the bucket (64 rows -> 5.2k rows/s, 192 ->
    # 10.9k, 256 -> 14.6k at 4-deep pipelining); 192 covers 64 concurrent
    # requests x 3 variants while keeping the light-load pad waste bounded
    microbatch_max: int = field(default_factory=lambda: _env("MICROBATCH_MAX", 192))
    # fused sweeps allowed in flight at once: the pipeline-depth /
    # batch-size trade (batcher.MicroBatcher docstring); swept on-chip
    microbatch_inflight: int = field(default_factory=lambda: _env("MICROBATCH_INFLIGHT", 4))
    # adaptive-bypass lanes: submissions run direct (thread-per-request
    # semantics, zero handoff) until this many are in flight, then pool
    # into coalesced batches — the "never a regression" policy
    # (batcher.MicroBatcher docstring); 0 = pure coalescing
    microbatch_direct: int = field(default_factory=lambda: _env("MICROBATCH_DIRECT", 32))


@dataclass
class StoreConfig:
    parents_db_path: str = field(default_factory=lambda: _env("PARENTS_DB_PATH", "parents.db"))
    feedback_db_path: str = field(default_factory=lambda: _env("FEEDBACK_DB_PATH", "feedback.db"))
    trace_dir: str = field(default_factory=lambda: _env("TRACE_DIR", "test_logs"))


@dataclass
class FrameworkConfig:
    """Root of the config tree."""

    chunking: ChunkingConfig = field(default_factory=ChunkingConfig)
    encoders: EncoderEnsembleConfig = field(default_factory=EncoderEnsembleConfig)
    index: IndexConfig = field(default_factory=IndexConfig)
    fusion: FusionConfig = field(default_factory=FusionConfig)
    rerank: RerankConfig = field(default_factory=RerankConfig)
    retrieval: RetrievalConfig = field(default_factory=RetrievalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    llm: LLMConfig = field(default_factory=LLMConfig)
    ingest: IngestConfig = field(default_factory=IngestConfig)
    serving: ServingConfig = field(default_factory=ServingConfig)
    store: StoreConfig = field(default_factory=StoreConfig)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_env(cls) -> "FrameworkConfig":
        return cls()


def sanitize_for_json(obj: Any) -> Any:
    """Convert numpy / jax scalars and arrays into plain JSON-serializable types
    (capability of reference config.py:24-44)."""
    import numpy as np

    if isinstance(obj, dict):
        return {k: sanitize_for_json(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [sanitize_for_json(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.bool_,)):
        return bool(obj)
    if hasattr(obj, "item") and not isinstance(obj, (str, bytes)):
        try:
            return obj.item()
        except Exception:
            return obj
    return obj
