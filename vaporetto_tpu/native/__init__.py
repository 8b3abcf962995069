"""ctypes bindings for the native (C++) host components.

The native library is optional at runtime: every entry point has a pure
Python/numpy fallback (compile/trie.py, utils/batch.py). Build with
``make -C vaporetto_tpu/native`` (done automatically on first import when a
compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libvaporetto_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR],
                capture_output=True,
                timeout=120,
                check=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.vt_build_trie.restype = ctypes.c_int
    lib.vt_build_trie.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.vt_free.restype = None
    lib.vt_free.argtypes = [ctypes.c_void_p]
    lib.vt_tensorize.restype = ctypes.c_int
    lib.vt_tensorize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.vt_extr_new.restype = ctypes.c_void_p
    lib.vt_extr_new.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    lib.vt_extr_add.restype = ctypes.c_int
    lib.vt_extr_add.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    for name in ("vt_extr_n_features", "vt_extr_n_examples",
                 "vt_extr_max_nnz", "vt_extr_keys_size"):
        getattr(lib, name).restype = ctypes.c_int64
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.vt_extr_export.restype = ctypes.c_int
    lib.vt_extr_export.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.vt_extr_export_keys.restype = None
    lib.vt_extr_export_keys.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.vt_extr_free.restype = None
    lib.vt_extr_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


class NativeExtractor:
    """ctypes wrapper for the C++ boundary-feature extractor."""

    def __init__(self, charw, charn, typew, typen, dictn, dict_words):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        offsets = np.zeros(len(dict_words) + 1, dtype=np.int64)
        for i, w in enumerate(dict_words):
            offsets[i + 1] = offsets[i] + len(w)
        flat = np.zeros(max(int(offsets[-1]), 1), dtype=np.int32)
        for i, w in enumerate(dict_words):
            flat[offsets[i] : offsets[i + 1]] = [ord(c) for c in w]
        self._h = lib.vt_extr_new(
            charw, charn, typew, typen, dictn,
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(dict_words),
        )

    def add(self, codepoints: np.ndarray, char_types: np.ndarray,
            boundaries: np.ndarray) -> None:
        cps = np.ascontiguousarray(codepoints, dtype=np.int32)
        cts = np.ascontiguousarray(char_types, dtype=np.uint8)
        bnd = np.ascontiguousarray(boundaries, dtype=np.uint8)
        rc = self._lib.vt_extr_add(
            self._h,
            cps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            bnd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(cps),
        )
        if rc != 0:
            raise RuntimeError("native extractor failed")

    @property
    def n_features(self) -> int:
        return self._lib.vt_extr_n_features(self._h)

    @property
    def n_examples(self) -> int:
        return self._lib.vt_extr_n_examples(self._h)

    def export(self):
        """Return (idx, val, labels) padded arrays."""
        n = self._lib.vt_extr_n_examples(self._h)
        K = max(self._lib.vt_extr_max_nnz(self._h), 1)
        idx = np.zeros((n, K), dtype=np.int32)
        val = np.zeros((n, K), dtype=np.float32)
        y = np.zeros(n, dtype=np.int32)
        rc = self._lib.vt_extr_export(
            self._h, K,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            val.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise RuntimeError("native extractor export failed")
        return idx, val, y

    def export_keys(self):
        """Return the feature key of each id (1-based order) as decoded
        tuples matching the Python trainer's feature keys."""
        nf = self._lib.vt_extr_n_features(self._h)
        size = self._lib.vt_extr_keys_size(self._h)
        blob = np.zeros(max(size, 1), dtype=np.uint8)
        offsets = np.zeros(nf + 1, dtype=np.int64)
        self._lib.vt_extr_export_keys(
            self._h,
            blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        raw = blob.tobytes()
        keys = []
        for i in range(nf):
            b = raw[offsets[i] : offsets[i + 1]]
            kind = b[0]
            if kind == 0x01:
                cps = np.frombuffer(b[1:-4], dtype=np.int32)
                rel = int(np.frombuffer(b[-4:], dtype=np.int32)[0])
                keys.append(("c", "".join(chr(c) for c in cps), rel))
            elif kind == 0x02:
                rel = int(np.frombuffer(b[-4:], dtype=np.int32)[0])
                keys.append(("t", b[1:-4], rel))
            else:
                length = int(np.frombuffer(b[1:5], dtype=np.int32)[0])
                keys.append(
                    ({0x03: "dl", 0x04: "di", 0x05: "dr"}[kind], length)
                )
        return keys

    def __del__(self):
        try:
            self._lib.vt_extr_free(self._h)
        except Exception:
            pass


def available() -> bool:
    return _load() is not None


def build_trie_native(
    patterns: Sequence[Tuple[int, ...]], n_symbols: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Build the double-array via C++; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    offsets = np.zeros(len(patterns) + 1, dtype=np.int64)
    for i, p in enumerate(patterns):
        offsets[i + 1] = offsets[i] + len(p)
    flat = np.empty(int(offsets[-1]), dtype=np.int32)
    for i, p in enumerate(patterns):
        flat[offsets[i] : offsets[i + 1]] = p
    base_p = ctypes.POINTER(ctypes.c_int32)()
    check_p = ctypes.POINTER(ctypes.c_int32)()
    value_p = ctypes.POINTER(ctypes.c_int32)()
    inherit_p = ctypes.POINTER(ctypes.c_int32)()
    n_slots = ctypes.c_int64()
    rc = lib.vt_build_trie(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(patterns),
        n_symbols,
        ctypes.byref(base_p),
        ctypes.byref(check_p),
        ctypes.byref(value_p),
        ctypes.byref(inherit_p),
        ctypes.byref(n_slots),
    )
    if rc != 0:
        return None
    n = n_slots.value
    base = np.ctypeslib.as_array(base_p, shape=(n,)).copy()
    check = np.ctypeslib.as_array(check_p, shape=(n,)).copy()
    value = np.ctypeslib.as_array(value_p, shape=(n,)).copy()
    inherit = np.ctypeslib.as_array(inherit_p, shape=(n,)).copy()
    for p in (base_p, check_p, value_p, inherit_p):
        lib.vt_free(p)
    return base, check, value, inherit


def tensorize_native(
    lines: Sequence[bytes], L: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Decode UTF-8 lines to (codepoints, types, lengths); None if no lib."""
    lib = _load()
    if lib is None:
        return None
    n = len(lines)
    offsets = np.zeros(n + 1, dtype=np.int64)
    for i, b in enumerate(lines):
        offsets[i + 1] = offsets[i] + len(b)
    buf = np.frombuffer(b"".join(lines), dtype=np.uint8) if n else np.zeros(
        0, dtype=np.uint8
    )
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)
    cps = np.zeros((n, L), dtype=np.int32)
    types = np.zeros((n, L), dtype=np.uint8)
    lengths = np.zeros(n, dtype=np.int32)
    rc = lib.vt_tensorize(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        L,
        cps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        types.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    return cps, types, lengths
