"""ctypes bindings for the native ASMK engine (libasmk_native.so).

``load()`` returns the bound library or None (numpy fallback in
slam/retrieval.py). Build with ``make -C mast3r_slam_tpu/native``; the first
``load()`` also attempts an automatic build if a compiler is available.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_HERE = pathlib.Path(__file__).resolve().parent
_LIB = None
_TRIED = False


def load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _HERE / "libasmk_native.so"
    if not so.exists():
        try:
            subprocess.run(["make", "-C", str(_HERE)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not so.exists():
        return None
    lib = ctypes.CDLL(str(so))
    i64 = ctypes.c_int64
    dbl = ctypes.c_double
    ptr = ctypes.c_void_p
    lib.asmk_binarize_pack.argtypes = [ptr, i64, i64, ptr]
    lib.asmk_hamming_cdist.argtypes = [ptr, i64, ptr, i64, i64, ptr]
    lib.asmk_ivf_create.restype = ptr
    lib.asmk_ivf_create.argtypes = [i64, i64]
    lib.asmk_ivf_destroy.argtypes = [ptr]
    lib.asmk_ivf_n_images.restype = i64
    lib.asmk_ivf_n_images.argtypes = [ptr]
    lib.asmk_ivf_add.argtypes = [ptr, ptr, ptr, i64, i64]
    lib.asmk_ivf_search.argtypes = [ptr, ptr, ptr, i64, dbl, dbl, ptr]
    try:   # serialization entry points (rebuild the .so if stale)
        lib.asmk_ivf_n_entries.restype = i64
        lib.asmk_ivf_n_entries.argtypes = [ptr]
        lib.asmk_ivf_export.argtypes = [ptr, ptr, ptr, ptr]
        lib.asmk_ivf_import.argtypes = [ptr, ptr, ptr, ptr, i64]
    except AttributeError:
        pass
    _LIB = lib
    return _LIB


def _cptr(arr):
    return arr.ctypes.data_as(ctypes.c_void_p)


class NativeIVF:
    """C++ inverted file with the same interface surface as retrieval.IVF."""

    def __init__(self, n_words: int, dim: int, lib=None):
        self.lib = lib or load()
        assert self.lib is not None
        self.n_words = n_words
        self.dim = dim
        self.handle = self.lib.asmk_ivf_create(n_words, dim)

    def __del__(self):
        if getattr(self, "handle", None) and self.lib:
            self.lib.asmk_ivf_destroy(self.handle)
            self.handle = None

    @property
    def n_images(self):
        return int(self.lib.asmk_ivf_n_images(self.handle))

    def add_packed(self, packed: np.ndarray, words: np.ndarray, imid: int):
        packed = np.ascontiguousarray(packed, dtype=np.uint64)
        words = np.ascontiguousarray(words, dtype=np.int64)
        self.lib.asmk_ivf_add(self.handle, _cptr(packed), _cptr(words),
                              len(words), int(imid))

    def flat_state(self):
        """Export all posting entries as flat arrays (checkpoint resume;
        the numpy IVF's state_dict equivalent, inverted_file.py:131-154)."""
        n = int(self.lib.asmk_ivf_n_entries(self.handle))
        wpv = (self.dim + 63) // 64
        vecs = np.zeros((n, wpv), dtype=np.uint64)
        words = np.zeros(n, dtype=np.int64)
        imids = np.zeros(n, dtype=np.int64)
        if n:
            self.lib.asmk_ivf_export(self.handle, _cptr(vecs), _cptr(words),
                                     _cptr(imids))
        return {"kind": "native", "n_words": self.n_words, "dim": self.dim,
                "vecs": vecs, "words": words, "imids": imids}

    @classmethod
    def from_flat(cls, state):
        ivf = cls(int(state["n_words"]), int(state["dim"]))
        vecs = np.ascontiguousarray(state["vecs"], dtype=np.uint64)
        words = np.ascontiguousarray(state["words"], dtype=np.int64)
        imids = np.ascontiguousarray(state["imids"], dtype=np.int64)
        if len(words):
            ivf.lib.asmk_ivf_import(ivf.handle, _cptr(vecs), _cptr(words),
                                    _cptr(imids), len(words))
        return ivf

    def search_packed(self, packed: np.ndarray, words: np.ndarray,
                      alpha: float, sim_thresh: float) -> np.ndarray:
        packed = np.ascontiguousarray(packed, dtype=np.uint64)
        words = np.ascontiguousarray(words, dtype=np.int64)
        scores = np.zeros(self.n_images, dtype=np.float32)
        if self.n_images:
            self.lib.asmk_ivf_search(self.handle, _cptr(packed), _cptr(words),
                                     len(words), float(alpha),
                                     float(sim_thresh), _cptr(scores))
        return scores


def binarize_pack64(des: np.ndarray) -> np.ndarray:
    """(n, dim) float -> (n, ceil(dim/64)) uint64 packed sign bits."""
    lib = load()
    des = np.ascontiguousarray(des, dtype=np.float32)
    n, dim = des.shape
    out = np.zeros((n, (dim + 63) // 64), dtype=np.uint64)
    lib.asmk_binarize_pack(_cptr(des), n, dim, _cptr(out))
    return out
