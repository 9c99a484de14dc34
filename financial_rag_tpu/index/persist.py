"""Shared index-persistence helpers.

- Atomic writes: npz + manifest go to a temp file in the same directory and
  are os.replace()d into place, so a crash mid-save or a concurrent
  cross-process loader (the processor's on_sweep_complete persistence) never
  observes a truncated file. Mirrors ingest/ledger.py's tmp+replace.
- dtype registry: manifests record the storage dtype by name so a reload
  reconstructs the index faithfully (an int8 index saved as raw ±127
  quantized values must not be reinterpreted as bf16 unit vectors).
"""

from __future__ import annotations

import json
import os
import threading
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from financial_rag_tpu.ops.topk import INT8_SCALE

STR_TO_DTYPE = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
    "int8": jnp.int8,
}


def dtype_name(dtype) -> str:
    return str(dtype.__name__ if hasattr(dtype, "__name__") else np.dtype(dtype).name)


def atomic_savez(path: Path, **arrays) -> None:
    """np.savez_compressed with tmp-file + rename (np appends .npz itself,
    so the tmp name must end in .npz). The tmp name is UNIQUE per call:
    concurrent savers of the same checkpoint (/admin/save racing the
    post-sweep persistence) must not interleave writes into one tmp file —
    last rename wins, each rename publishing a complete archive."""
    path = Path(path)
    tmp = path.with_name(f"{path.stem}.tmp{os.getpid()}_{threading.get_ident()}.npz")
    try:
        np.savez_compressed(tmp, **arrays)
        os.replace(tmp, path)
    except BaseException:
        # unique tmp names don't self-heal by overwrite: a failed write
        # (e.g. ENOSPC, retried every sweep) must not leak a file per
        # attempt
        tmp.unlink(missing_ok=True)
        raise


def atomic_write_text(path: Path, text: str) -> None:
    path = Path(path)
    # unique tmp per writer (same rationale + cleanup as atomic_savez)
    tmp = path.with_name(f"{path.name}.tmp{os.getpid()}_{threading.get_ident()}")
    try:
        tmp.write_text(text)
        os.replace(tmp, path)
    except BaseException:
        tmp.unlink(missing_ok=True)
        raise


def atomic_write_json(path: Path, obj) -> None:
    atomic_write_text(path, json.dumps(obj, indent=2))


def pad_pow2(*arrays):
    """Pad each array's leading dim to the next power of two by repeating
    its last element. Used before donated index scatters: duplicate writes
    of the same value are idempotent, and power-of-two batch shapes keep
    the jit compile count logarithmic instead of per-batch-size. All
    arrays must share the leading dim, which must be >= 1 (callers guard
    the empty batch — padding has nothing to repeat)."""
    n = arrays[0].shape[0]
    npad = 1 << max(int(np.ceil(np.log2(max(n, 1)))), 0)
    if npad == n:
        return arrays
    pad = npad - n
    out = []
    for a in arrays:
        if isinstance(a, np.ndarray):
            out.append(np.concatenate([a, np.broadcast_to(a[-1], (pad,) + a.shape[1:])]))
        else:
            out.append(jnp.concatenate(
                [a, jnp.broadcast_to(a[-1], (pad,) + a.shape[1:])]))
    return tuple(out)


def encode_payload(vectors_f32: np.ndarray, dtype):
    """Host float32 unit vectors -> (device payload, per-row weights f32).

    int8 quantizes PER VECTOR by its max-abs coordinate: a unit vector in
    384-d has per-coordinate magnitude ~1/sqrt(384) ~ 0.05, so the old
    global x127 scale used only ~±6 of the 127 levels; per-vector scaling
    recovers the full range (~5x finer). The weight (max/127) rides in the
    index's validity array — the search kernels multiply scores by it, so
    live slots carry their dequantization scale and empty slots stay 0.
    Float dtypes get weight 1.0 (scores pass through unchanged)."""
    v = np.asarray(vectors_f32, np.float32)
    if dtype == jnp.int8:
        m = np.maximum(np.abs(v).max(axis=1), 1e-12)
        q = np.clip(np.round(v * (INT8_SCALE / m[:, None])), -127, 127).astype(np.int8)
        return jnp.asarray(q), (m / INT8_SCALE).astype(np.float32)
    return jnp.asarray(v, dtype), np.ones(v.shape[0], np.float32)


def decode_payload(raw: np.ndarray, saved_dtype: str | None,
                   weights: np.ndarray | None = None) -> np.ndarray:
    """Saved npz payload -> float32 unit-vector space. int8 indexes persist
    their raw quantized values (cast to f32 in the npz) with per-row
    dequantization weights in the validity array; everything else is
    already in unit-vector space.

    Legacy guard: pre-weight int8 saves carried valid == 1.0 flags. A real
    per-vector weight is max|unit|/127 <= 1/127 < 0.5, so weights > 0.5
    mean legacy flags — fall back to the old global 1/127 decode."""
    raw = np.asarray(raw, np.float32)
    if saved_dtype == "int8":
        if weights is not None and len(weights) and np.max(weights) <= 0.5:
            return raw * np.asarray(weights, np.float32)[:, None]
        return raw / INT8_SCALE
    return raw
