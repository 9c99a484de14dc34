"""ctypes bindings for the native C++ components (built via `make` in this
directory). Every binding has a pure-Python fallback; `available()` reports
whether the shared library loaded. The library is auto-built on first
import when a C++ toolchain is present."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from financial_rag_tpu.utils import get_logger

log = get_logger("native")

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libfragnative.so"
_lib: Optional[ctypes.CDLL] = None
_build_attempted = False


def _try_build() -> None:
    """Run make once per process even when the .so exists: a stale library
    (sources newer than the build) would load without newly added symbols;
    make is a no-op when up to date."""
    global _build_attempted
    if _build_attempted:
        return
    _build_attempted = True
    try:
        subprocess.run(["make", "-C", str(_DIR)], check=True,
                       capture_output=True, text=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        if not _LIB_PATH.exists():
            log.warning("native build unavailable (%s); using Python fallbacks", e)


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    _try_build()
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))

    lib.wp_new.restype = ctypes.c_void_p
    lib.wp_new.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.wp_free.argtypes = [ctypes.c_void_p]
    lib.wp_tokenize.restype = ctypes.c_int32
    lib.wp_tokenize.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    lib.wp_tokenize_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32)]

    lib.bm25_new.restype = ctypes.c_void_p
    lib.bm25_new.argtypes = [ctypes.c_float, ctypes.c_float, ctypes.c_float]
    lib.bm25_free.argtypes = [ctypes.c_void_p]
    lib.bm25_add_doc.restype = ctypes.c_int32
    lib.bm25_add_doc.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
    lib.bm25_finalize.argtypes = [ctypes.c_void_p]
    lib.bm25_num_docs.restype = ctypes.c_int32
    lib.bm25_num_docs.argtypes = [ctypes.c_void_p]
    lib.bm25_score.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                               ctypes.POINTER(ctypes.c_float)]

    lib.ft_word_count.restype = ctypes.c_int64
    lib.ft_word_count.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.ft_word_starts.restype = ctypes.c_int64
    lib.ft_word_starts.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                   ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
    _lib = lib
    return lib


def native_word_count(text_bytes: bytes) -> int:
    """\\w+ run count for ASCII bytes (exact re.findall(r"\\w+") count)."""
    lib = _load()
    return lib.ft_word_count(text_bytes, len(text_bytes))


def native_word_starts(text_bytes: bytes) -> np.ndarray:
    """Byte offsets of \\w+ run starts for ASCII bytes (int64 array)."""
    lib = _load()
    # words are separated by >=1 non-word byte, so at most ceil(len/2)+1
    cap = len(text_bytes) // 2 + 1
    out = np.empty(cap, np.int64)
    n = lib.ft_word_starts(text_bytes, len(text_bytes),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap)
    return out[:n]


def available() -> bool:
    return _load() is not None


class NativeWordPiece:
    """C++ WordPiece for ASCII text (exact HF semantics for that subset).
    Use through tokenizer.wordpiece's wrapper, which routes non-ASCII to
    Python."""

    def __init__(self, vocab_tokens: Sequence[str]) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        data = "\n".join(vocab_tokens).encode("utf-8")
        self._handle = ctypes.c_void_p(lib.wp_new(data, len(data)))
        if not self._handle:
            raise RuntimeError("wp_new failed")

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.wp_free(self._handle)
        except Exception:
            pass

    def tokenize_ids(self, text: str, max_out: int = 4096) -> List[int]:
        raw = text.encode("ascii")
        out = (ctypes.c_int32 * max_out)()
        n = self._lib.wp_tokenize(self._handle, raw, len(raw), out, max_out)
        return list(out[:n])

    def tokenize_ids_batch_packed(self, texts: Sequence[str], max_out: int = 510):
        """One C++ call for the whole batch; returns the raw (ids [n,
        max_out] int32 zero-padded, lens [n] int32) matrices — callers that
        pack fixed-shape device batches consume these without ever
        materializing per-text Python lists."""
        enc = [t.encode("ascii") for t in texts]
        offsets = np.zeros(len(enc) + 1, np.int64)
        np.cumsum([len(e) for e in enc], out=offsets[1:])
        blob = b"".join(enc)
        n = len(enc)
        out = np.zeros((n, max_out), np.int32)
        lens = np.zeros(n, np.int32)
        self._lib.wp_tokenize_batch(
            self._handle, blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_out,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out, lens

    def tokenize_ids_batch(self, texts: Sequence[str], max_out: int = 510) -> List[List[int]]:
        out, lens = self.tokenize_ids_batch_packed(texts, max_out)
        return [out[i, : lens[i]].tolist() for i in range(len(texts))]


class NativeBM25:
    """C++ inverted-index BM25 with rank_bm25-compatible scoring."""

    def __init__(self, corpus_texts: Sequence[str],
                 k1: float = 1.5, b: float = 0.75, eps: float = 0.25) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._handle = ctypes.c_void_p(lib.bm25_new(k1, b, eps))
        for t in corpus_texts:
            raw = t.encode("utf-8")
            lib.bm25_add_doc(self._handle, raw, len(raw))
        lib.bm25_finalize(self._handle)
        self.n_docs = lib.bm25_num_docs(self._handle)

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.bm25_free(self._handle)
        except Exception:
            pass

    def get_scores(self, query_text: str) -> np.ndarray:
        out = np.zeros(self.n_docs, np.float32)
        raw = query_text.encode("utf-8")
        self._lib.bm25_score(self._handle, raw, len(raw),
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
