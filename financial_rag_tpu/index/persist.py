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
    so the tmp name must already end in .npz)."""
    path = Path(path)
    tmp = path.with_name(path.stem + ".tmp.npz")
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def atomic_write_text(path: Path, text: str) -> None:
    path = Path(path)
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_text(text)
    os.replace(tmp, path)


def atomic_write_json(path: Path, obj) -> None:
    atomic_write_text(path, json.dumps(obj, indent=2))


def encode_payload(vectors_f32: np.ndarray, dtype) -> jnp.ndarray:
    """Host float32 unit vectors -> device storage payload (int8 quantizes
    symmetrically by INT8_SCALE; rounding, not truncation)."""
    if dtype == jnp.int8:
        q = np.clip(np.round(np.asarray(vectors_f32, np.float32) * INT8_SCALE),
                    -127, 127).astype(np.int8)
        return jnp.asarray(q)
    return jnp.asarray(vectors_f32, dtype)


def decode_payload(raw: np.ndarray, saved_dtype: str | None) -> np.ndarray:
    """Saved npz payload -> float32 unit-vector space. int8 indexes persist
    their raw quantized values (cast to f32 in the npz); everything else is
    already in unit-vector space."""
    raw = np.asarray(raw, np.float32)
    if saved_dtype == "int8":
        return raw / INT8_SCALE
    return raw
