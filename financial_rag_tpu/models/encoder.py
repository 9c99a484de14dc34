"""Batched sentence-encoder service.

Replaces the reference's LocalEmbedder/SentenceTransformerWrapper pair
(reference local_embedder.py:155-275) — which encodes one text at a time on
CPU torch — with an XLA-shaped service:

- texts are tokenized host-side (exact WordPiece), bucketed by sequence
  length to {64, 128, 256, 512} and padded to a fixed batch size, so the
  whole deployment compiles a small, fixed set of programs (compiles are
  cached persistently across processes);
- each program is one jitted encoder-stack forward + fused pool/normalize
  on [B, S] int32 batches, bf16 compute on TPU;
- `encode()` accepts any number of texts and returns [N, D] float32 unit
  vectors in input order.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from financial_rag_tpu.config import ModelConfig
from financial_rag_tpu.models.bert import bert_encode
from financial_rag_tpu.models.checkpoint import load_params
from financial_rag_tpu.tokenizer import WordPieceTokenizer
from financial_rag_tpu.utils import get_logger, time_block

log = get_logger("models.encoder")

SEQ_BUCKETS = (64, 128, 256, 512)


def setup_compilation_cache(path: str = None) -> None:
    """Enable JAX's persistent compilation cache (TPU compiles via the
    tunnel take minutes; this makes them one-time)."""
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  os.path.expanduser("~/.cache/jax_compilation"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


class Encoder:
    """One checkpoint, batched encode to unit vectors."""

    device_backed = True   # JAX forward: micro-batching coalesces dispatches
    # class flags, NOT hasattr: BatchingEncoder delegates attribute lookups
    # to its inner encoder, so hasattr(wrapper, "encode_begin") is True but
    # calling it would bypass the cross-request batching queue; wrappers
    # and subclasses opt in/out explicitly
    supports_encode_begin = True
    accepts_seqs = True         # encode_begin(seqs=...) pretokenized input
    supports_device_out = True  # encode_begin_device exists

    def __init__(
        self,
        config: ModelConfig,
        params,
        tokenizer: Optional[WordPieceTokenizer] = None,
        *,
        pooling: str = "mean",
        batch_size: int = 128,
        max_seq_len: int = 512,
        compute_dtype=None,
        attention_impl: Optional[str] = None,
        use_pallas_pool: Optional[bool] = None,
        mesh=None,
    ) -> None:
        self.config = config
        self.params = params
        self.tokenizer = tokenizer or WordPieceTokenizer()
        self.pooling = pooling
        self.batch_size = batch_size
        self.max_seq_len = max_seq_len
        # data-parallel encode (SURVEY §2.5): a jax.sharding.Mesh with a
        # "data" axis shards each token batch across its devices via
        # shard_map (see _fn). Every batch bucket must divide across the
        # mesh, so batch_size rounds up to a mesh multiple and
        # _batch_bucket floors at mesh.size. None = single-device jit.
        self.mesh = mesh
        if mesh is not None and self.batch_size % mesh.size:
            self.batch_size = ((self.batch_size // mesh.size) + 1) * mesh.size
        on_tpu = jax.default_backend() == "tpu"
        self._on_tpu = on_tpu
        self.compute_dtype = compute_dtype or (jnp.bfloat16 if on_tpu else jnp.float32)
        # "auto": fused Pallas attention wins at long sequences (1.76x at
        # s=512 on v5e); at s<256 the [S,S] tiles are small enough that
        # XLA's fused path is faster
        self.attention_impl = attention_impl or "auto"
        self.use_pallas_pool = on_tpu if use_pallas_pool is None else use_pallas_pool
        self._fns: Dict[int, object] = {}

    @classmethod
    def from_pretrained(cls, model_dir: str, *, pooling: str, fallback_seed: Optional[int] = None,
                        **kwargs) -> "Encoder":
        params, config = load_params(model_dir, fallback_seed=fallback_seed)
        tok = WordPieceTokenizer(vocab_path=os.path.join(model_dir, "vocab.txt")
                                 if os.path.exists(os.path.join(model_dir, "vocab.txt")) else None)
        return cls(config, params, tok, pooling=pooling, **kwargs)

    @property
    def dim(self) -> int:
        return self.config.hidden_size

    def _fn(self, seq_len: int):
        fn = self._fns.get(seq_len)
        if fn is None:
            impl = self.attention_impl
            if impl == "auto":
                from financial_rag_tpu.models.bert import resolve_attention_impl

                impl = resolve_attention_impl(seq_len)
            raw = partial(
                bert_encode,
                config=self.config,
                pooling=self.pooling,
                compute_dtype=self.compute_dtype,
                attention_impl=impl,
                use_pallas_pool=self.use_pallas_pool,
                use_fused_ffn=self._on_tpu,
            )
            if self.mesh is not None:
                # shard_map, not GSPMD auto-sharding: the Pallas custom
                # calls carry no partitioning rule, so under plain jit the
                # SPMD partitioner would replicate the batch; inside
                # shard_map each device runs the identical kernels on its
                # local batch shard (params replicated)
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                fn = jax.jit(shard_map(
                    raw, mesh=self.mesh,
                    in_specs=(P(), P("data", None), P("data", None)),
                    out_specs=P("data", None), check_vma=False))
            else:
                fn = jax.jit(raw)
            self._fns[seq_len] = fn
        return fn

    def _bucket(self, n_tokens: int) -> int:
        for b in SEQ_BUCKETS:
            if n_tokens <= b and b <= self.max_seq_len:
                return b
        return self.max_seq_len

    def _batch_bucket(self, n: int) -> int:
        """Pad tiny (query-time) batches to 8/32 instead of the full ingest
        batch — a 3-variant query encode shouldn't pay for 128 rows. Under
        a data mesh every bucket must divide across the devices, so the
        mesh size floors the bucket (a 16-device mesh pads to 16+)."""
        floor = self.mesh.size if self.mesh is not None else 1
        for b in (8, 32):
            if n <= b and b < self.batch_size and b % floor == 0:
                return b
        # batch_size is rounded up to a mesh multiple at construction
        return max(self.batch_size, floor)

    def encode_begin(self, texts: Sequence[str], *, seqs=None):
        """Tokenize and ENQUEUE every device batch; returns a zero-arg
        materializer producing [N, dim] float32 unit vectors (input order).

        Dispatch is async, so the device pipelines all batches back-to-back
        and per-call latency (~50ms through a tunneled chip) amortizes
        across the sweep; callers that drive several encoders can begin
        them all before materializing any (DualEncoder.encode_all).

        ``seqs``: precomputed packed (ids [N, max_seq_len], lens [N]) from
        this tokenizer's encode_many_packed — lets an ensemble sharing one
        vocab tokenize each text once instead of once per encoder."""
        pending = self._dispatch_batches(texts, seqs)
        if pending is None:
            return lambda: np.zeros((0, self.dim), np.float32)

        def materialize() -> np.ndarray:
            out = np.zeros((len(texts), self.dim), np.float32)
            for batch_idx, n, emb in pending:
                out[batch_idx] = np.asarray(emb[:n], np.float32)
            return out

        return materialize

    def encode_begin_device(self, texts: Sequence[str], *, seqs=None,
                            seq_bucket: Optional[int] = None,
                            rows_bucket: Optional[int] = None):
        """Like encode_begin but the materializer returns a DEVICE [N, dim]
        array in input order (an on-device gather; nothing crosses the
        host boundary). Feeds device-direct index upserts during ingest.

        ``seq_bucket`` / ``rows_bucket`` pin EVERY row to one sequence
        bucket and the whole call to one batch shape: the serving wave
        batcher (serving/batcher.py MultiIndexBatcher._chained_begin) pads
        its text batch to a fixed row count, so pinning makes the entire
        chained encode->sweep program a small, warmable set of static
        shapes — length-mix-dependent batch splits would otherwise compile
        a fresh gather/concat program per first-seen mix (a p95 stall
        through a tunneled chip)."""
        pending = self._dispatch_batches(texts, seqs, seq_bucket=seq_bucket,
                                         rows_bucket=rows_bucket)
        if pending is None:
            return lambda: jnp.zeros((0, self.dim), jnp.float32)

        def materialize_device():
            if len(pending) == 1:
                batch_idx, n, emb = pending[0]
                embs, order = emb[:n], batch_idx
            else:
                embs = jnp.concatenate([emb[:n] for _, n, emb in pending])
                order = np.concatenate([bi for bi, _, _ in pending])
            inv = np.empty(len(order), np.int32)
            inv[order] = np.arange(len(order), dtype=np.int32)
            return embs[jnp.asarray(inv)]

        return materialize_device

    def _dispatch_batches(self, texts: Sequence[str], seqs=None, *,
                          seq_bucket: Optional[int] = None,
                          rows_bucket: Optional[int] = None):
        """Tokenize + enqueue every device forward; returns a list of
        (batch_idx, n_valid, device_emb) or None for an empty input.
        seq_bucket/rows_bucket pin the shapes (encode_begin_device)."""
        if not len(texts):
            return None
        if seqs is None:
            with time_block("encoder.tokenize"):
                seqs = self.tokenizer.encode_many_packed(texts, max_len=self.max_seq_len)
        all_ids, all_lens = seqs

        order = np.argsort(all_lens, kind="stable")
        if seq_bucket is not None:
            pin = min(int(seq_bucket), self.max_seq_len)
            bucket_of = np.full(len(texts), pin)
        else:
            bucket_of = np.asarray([self._bucket(int(ln)) for ln in all_lens])
        pending = []
        lo = 0
        n_total = len(texts)
        while lo < n_total:
            seq_len = int(bucket_of[order[lo]])
            hi = lo
            while hi < n_total and bucket_of[order[hi]] == seq_len and hi - lo < self.batch_size:
                hi += 1
            batch_idx = order[lo:hi]
            lo = hi
            n = len(batch_idx)
            # a pinned row count must still divide a data-parallel mesh
            pin_ok = (rows_bucket is not None and rows_bucket >= n
                      and (self.mesh is None or rows_bucket % self.mesh.size == 0))
            bsz = rows_bucket if pin_ok else self._batch_bucket(n)
            ids = np.full((bsz, seq_len), self.tokenizer.pad_id, np.int32)
            mask = np.zeros((bsz, seq_len), np.int32)
            ids[:n] = all_ids[batch_idx, :seq_len]
            mask[:n] = np.arange(seq_len)[None, :] < np.minimum(
                all_lens[batch_idx], seq_len)[:, None]
            # pad rows must be non-empty for the masked ops; mark 1 token
            mask[n:, 0] = 1
            with time_block(f"encoder.forward_s{seq_len}"):
                emb = self._fn(seq_len)(self.params, jnp.asarray(ids), jnp.asarray(mask))
            pending.append((batch_idx, n, emb))
        return pending

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        """Encode texts -> [N, dim] float32 unit vectors (input order)."""
        return self.encode_begin(texts)()

    def encode_one(self, text: str) -> np.ndarray:
        return self.encode([text])[0]


class TokenEncoder:
    """Per-token embeddings for the late-interaction (multivector) tier:
    encoder last hidden states with CLS/SEP dropped, L2-normalized
    (semantics of reference multivector_store.py:100-110)."""

    def __init__(self, encoder: Encoder, max_tokens: int = 128,
                 batch_size: int = 32) -> None:
        self.encoder = encoder
        self.max_tokens = max_tokens
        self.batch_size = batch_size
        self._fns: Dict[int, object] = {}

    def _fn(self, seq_len: int):
        """Jitted batched last-hidden-states forward, cached per bucket."""
        fn = self._fns.get(seq_len)
        if fn is None:
            from functools import partial

            import jax

            from financial_rag_tpu.models.bert import bert_forward

            enc = self.encoder
            impl = enc.attention_impl
            if impl == "auto":
                impl = "xla"  # short sequences: kernel launch overhead loses
            fn = jax.jit(partial(
                bert_forward, config=enc.config,
                compute_dtype=enc.compute_dtype, attention_impl=impl))
            self._fns[seq_len] = fn
        return fn

    def encode_tokens(self, texts: Sequence[str]) -> List[np.ndarray]:
        """Per-text ragged token embeddings, computed in length-bucketed
        batched forwards (one device call per bucket chunk) — the batch-1
        loop this replaces was the exact reference pattern the framework
        exists to kill (reference local_embedder.py:160-184)."""
        enc = self.encoder
        if not len(texts):
            return []
        seqs = [enc.tokenizer.encode(t, max_len=self.max_tokens + 2) for t in texts]
        buckets: Dict[int, List[int]] = {}
        for i, s in enumerate(seqs):
            pad_to = min(max(64, ((len(s) + 63) // 64) * 64), enc.max_seq_len)
            buckets.setdefault(pad_to, []).append(i)

        out: List[Optional[np.ndarray]] = [None] * len(texts)
        pad_id = enc.tokenizer.pad_id
        for seq_len, idxs in sorted(buckets.items()):
            for lo in range(0, len(idxs), self.batch_size):
                batch_idx = idxs[lo: lo + self.batch_size]
                n = len(batch_idx)
                bsz = 8 if n <= 8 else self.batch_size
                ids = np.full((bsz, seq_len), pad_id, np.int32)
                mask = np.zeros((bsz, seq_len), np.int32)
                for r, i in enumerate(batch_idx):
                    s = seqs[i][:seq_len]
                    ids[r, : len(s)] = s
                    mask[r, : len(s)] = 1
                mask[n:, 0] = 1  # pad rows must be non-empty for masked ops
                hidden = np.asarray(self._fn(seq_len)(
                    enc.params, jnp.asarray(ids), jnp.asarray(mask)), np.float32)
                for r, i in enumerate(batch_idx):
                    ln = len(seqs[i])
                    vecs = hidden[r, 1: ln - 1]  # drop CLS/SEP
                    if len(vecs) == 0:
                        vecs = hidden[r, :1]
                    out[i] = vecs / np.maximum(
                        np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        return out


class DualEncoder:
    """The BAAI + GTE ensemble (reference retriever.py:26-57): two encoders
    sharing one tokenizer/vocab, each feeding its own index collection, plus
    the dormant fused single-vector mode (0.6/0.4 — reference
    chunker.py:252-260)."""

    def __init__(self, encoders: Dict[str, Encoder], fused_weights: Tuple[float, ...] = (0.6, 0.4),
                 cache=None):
        assert encoders, "at least one encoder required"
        self.encoders = encoders
        self.fused_weights = fused_weights
        self.cache = cache  # optional utils.embed_cache.EmbeddingCache (query side)
        self._shared_tok = None  # lazily resolved; False = not shareable

    @property
    def names(self) -> List[str]:
        return list(self.encoders.keys())

    def _shared_tokenizer(self):
        """The one tokenizer all member encoders agree on, or None. BAAI
        bge-small and GTE-small ship byte-identical bert-uncased vocabs, so
        the ensemble tokenizes each text ONCE (the per-encoder tokenize was
        half the ingest host time)."""
        if self._shared_tok is None:
            toks = []
            for enc in self.encoders.values():
                if not getattr(type(enc), "accepts_seqs", False):
                    toks = None
                    break
                toks.append((enc.tokenizer, enc.max_seq_len))
            ok = bool(toks) and all(
                s == toks[0][1] and (t is toks[0][0] or t.vocab == toks[0][0].vocab)
                for t, s in toks)
            self._shared_tok = toks[0] if ok else False
        return self._shared_tok or None

    def encode_all_begin(self, texts: Sequence[str], *,
                         device_out: bool = False) -> Dict[str, object]:
        """Begin every encoder (tokenizing once when vocabs agree) WITHOUT
        materializing: {model_name: materializer-or-array}. Callers overlap
        host work with the in-flight device forwards, then materialize.
        device_out: materializers yield device arrays (for device-direct
        index upserts); encoders without the begin-split still return host
        arrays — callers must handle both."""
        seqs = None
        shared = self._shared_tokenizer()
        if shared is not None and len(texts):
            tok, max_len = shared
            with time_block("encoder.tokenize"):
                seqs = tok.encode_many_packed(texts, max_len=max_len)
        out: Dict[str, object] = {}
        for name, enc in self.encoders.items():
            t = type(enc)
            if device_out and getattr(t, "supports_device_out", False):
                out[name] = enc.encode_begin_device(texts, seqs=seqs)
            elif getattr(t, "supports_encode_begin", False):
                out[name] = (enc.encode_begin(texts, seqs=seqs)
                             if getattr(t, "accepts_seqs", False)
                             else enc.encode_begin(texts))
            else:
                out[name] = enc.encode(texts)
        return out

    def cached_all(self, texts: Sequence[str]) -> Optional[Dict[str, np.ndarray]]:
        """Every (model, text) embedding straight from the query cache, or
        None if ANY is missing. Callers with a device-chained path (the
        hybrid raw lane) re-encode the WHOLE batch on a miss: at query
        sizes a 3-row forward costs the same device call as a 1-row one,
        and the all-or-nothing contract keeps the chained dispatch free of
        per-row host plumbing."""
        if self.cache is None or not len(texts):
            return None
        out: Dict[str, np.ndarray] = {}
        for name in self.encoders:
            vecs = [self.cache.get(name, t) for t in texts]
            if any(v is None for v in vecs):
                return None
            out[name] = np.stack(vecs)
        return out

    def encode_all(self, texts: Sequence[str], use_cache: bool = False) -> Dict[str, np.ndarray]:
        """Per-model embeddings: {model_name: [N, D]}. use_cache routes
        through the md5 embedding cache (query side only)."""
        if not (use_cache and self.cache is not None):
            # begin every raw Encoder before materializing any, so both
            # models' device batches pipeline back-to-back (wrapped/host
            # encoders lack the split and run inline)
            begun = self.encode_all_begin(texts)
            return {name: (v() if callable(v) else v) for name, v in begun.items()}
        # cache path: find each encoder's misses first, BEGIN all misses,
        # then materialize — same dispatch overlap as the uncached branch
        # (serially encoding per model re-pays a device round trip each)
        vecs_by: Dict[str, list] = {}
        missing_by: Dict[str, list] = {}
        begun2: Dict[str, object] = {}
        for name, enc in self.encoders.items():
            vecs = [self.cache.get(name, t) for t in texts]
            missing = [i for i, v in enumerate(vecs) if v is None]
            vecs_by[name] = vecs
            missing_by[name] = missing
            if missing:
                miss_texts = [texts[i] for i in missing]
                begun2[name] = (enc.encode_begin(miss_texts)
                                if getattr(type(enc), "supports_encode_begin", False)
                                else enc.encode(miss_texts))
        out: Dict[str, np.ndarray] = {}
        for name in self.encoders:
            vecs, missing = vecs_by[name], missing_by[name]
            if missing:
                v = begun2[name]
                fresh = v() if callable(v) else v
                for row, i in enumerate(missing):
                    vecs[i] = fresh[row]
                    self.cache.put(name, texts[i], fresh[row])
            out[name] = np.stack(vecs)
        return out

    def encode_fused(self, texts: Sequence[str]) -> np.ndarray:
        """Weighted-sum single vector, re-normalized."""
        per = self.encode_all(texts)
        acc = None
        for w, name in zip(self.fused_weights, self.names):
            acc = w * per[name] if acc is None else acc + w * per[name]
        return acc / np.maximum(np.linalg.norm(acc, axis=1, keepdims=True), 1e-12)
