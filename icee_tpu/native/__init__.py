"""Native (C++) host data-path with a transparent NumPy fallback.

``RaggedCaptions`` stores a corpus of encoded captions as one flat int32
stream plus prefix offsets (encode once, reuse every epoch — the reference
re-tokenizes text in DataLoader workers each epoch).  Batch assembly and the
token histogram dispatch to the threaded C++ library
(:mod:`icee_tpu.native.batcher`), auto-built with g++ on first use; if no
toolchain is available everything falls back to NumPy with identical
results (tested equal).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "batcher.cpp")
# the artifact lives in a non-package subdir so module scanners (pkgutil)
# never mistake the ctypes library for a Python extension module
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_LIB = os.path.join(_BUILD_DIR, "libicee_batcher.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            # build to a unique temp path + atomic rename so concurrent
            # processes AND threads never dlopen a half-written library
            import tempfile

            os.makedirs(_BUILD_DIR, exist_ok=True)
            fd, tmp = tempfile.mkstemp(
                suffix=".so", prefix="icee_batcher_",
                dir=_BUILD_DIR)
            os.close(fd)
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-pthread",
                     _SRC, "-o", tmp],
                    check=True, capture_output=True)
                os.replace(tmp, _LIB)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        lib = ctypes.CDLL(_LIB)
        lib.make_padded_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.count_tokens.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ]
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


class RaggedCaptions:
    """Flat ragged storage of encoded captions: ``data`` (total_tokens,)
    int32, ``offsets`` (n+1,) int64."""

    def __init__(self, caption_ids: Sequence[Sequence[int]]) -> None:
        lengths = np.asarray([len(c) for c in caption_ids], np.int64)
        self.offsets = np.zeros(len(caption_ids) + 1, np.int64)
        np.cumsum(lengths, out=self.offsets[1:])
        self.data = np.empty(int(self.offsets[-1]), np.int32)
        for i, c in enumerate(caption_ids):
            self.data[self.offsets[i]:self.offsets[i + 1]] = c

    def __len__(self) -> int:
        return len(self.offsets) - 1

    def batch(self, indices: np.ndarray, max_len: int, pad_id: int = 0,
              n_threads: int = 4, force_numpy: bool = False):
        """-> (captions (n, max_len) int32, lengths (n,) int32)."""
        indices = np.ascontiguousarray(indices, np.int64)
        n = len(indices)
        captions = np.empty((n, max_len), np.int32)
        lengths = np.empty((n,), np.int32)
        lib = None if force_numpy else _load()
        if lib is not None:
            lib.make_padded_batch(
                _ptr(self.data, ctypes.c_int32),
                _ptr(self.offsets, ctypes.c_int64),
                _ptr(indices, ctypes.c_int64),
                ctypes.c_int64(n), ctypes.c_int32(max_len),
                ctypes.c_int32(pad_id),
                _ptr(captions, ctypes.c_int32),
                _ptr(lengths, ctypes.c_int32), ctypes.c_int32(n_threads))
            return captions, lengths
        captions.fill(pad_id)
        for i, row in enumerate(indices):
            seq = self.data[self.offsets[row]:self.offsets[row + 1]][:max_len]
            captions[i, : len(seq)] = seq
            lengths[i] = len(seq)
        return captions, lengths

    def token_counts(self, vocab_size: int, n_threads: int = 4,
                     force_numpy: bool = False) -> np.ndarray:
        lib = None if force_numpy else _load()
        if lib is not None:
            counts = np.empty((vocab_size,), np.int64)
            lib.count_tokens(
                _ptr(self.data, ctypes.c_int32),
                ctypes.c_int64(self.data.size), ctypes.c_int32(vocab_size),
                _ptr(counts, ctypes.c_int64), ctypes.c_int32(n_threads))
            return counts
        return np.bincount(
            self.data[(self.data >= 0) & (self.data < vocab_size)],
            minlength=vocab_size).astype(np.int64)
