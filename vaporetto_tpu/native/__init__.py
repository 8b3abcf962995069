"""ctypes bindings for the native (C++) host components.

The native library is optional at runtime: every entry point has a pure
Python/numpy fallback (compile/trie.py, utils/batch.py). Build with
``make -C vaporetto_tpu/native`` (done automatically on first import when a
compiler is available).
"""

from __future__ import annotations

import ctypes
import itertools
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libvaporetto_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _stale() -> bool:
    """True when any native source is newer than the built library — a
    stale .so can lack newly added symbols, which would silently degrade
    paths that probe them with hasattr."""
    try:
        so_mtime = os.path.getmtime(_LIB_PATH)
    except OSError:
        return True
    for name in os.listdir(_DIR):
        if name.endswith((".cc", ".h")) or name == "Makefile":
            try:
                if os.path.getmtime(os.path.join(_DIR, name)) > so_mtime:
                    return True
            except OSError:
                pass
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("VAPORETTO_TPU_NO_NATIVE") == "1":
        return None  # force the pure-Python fallbacks (testing)
    if not os.path.exists(_LIB_PATH) or _stale():
        try:
            # Inter-process lock: the multi-process CLIs import this
            # module in N processes at once; concurrent `make` runs on
            # the same .so can race (one process loads a half-written
            # library, silently degrading to Python fallbacks). The lock
            # serializes the rebuild; late arrivals re-check staleness
            # and find the fresh library already built.
            import fcntl

            lock_path = _LIB_PATH + ".lock"
            with open(lock_path, "w") as lock_f:
                fcntl.flock(lock_f, fcntl.LOCK_EX)
                if not os.path.exists(_LIB_PATH) or _stale():
                    subprocess.run(
                        ["make", "-C", _DIR],
                        capture_output=True,
                        timeout=120,
                        check=True,
                    )
                fcntl.flock(lock_f, fcntl.LOCK_UN)
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None
            # stale rebuild failed (e.g. no compiler): fall through and
            # load the existing library — callers hasattr-guard new
            # symbols
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
    # round 5 changed these EXISTING signatures (types output); a stale
    # pre-round-5 .so (rebuild failed: no compiler) must be driven with
    # the old protocol — hasattr cannot see signature changes, so the
    # vt_abi_version marker gates them
    abi5 = hasattr(lib, "vt_abi_version")
    if abi5:
        lib.vt_abi_version.restype = ctypes.c_int
        lib.vt_abi_version.argtypes = []
    lib.vt_tensorize16.restype = ctypes.c_int
    lib.vt_tensorize16.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_int32),
    ] + ([ctypes.POINTER(ctypes.c_uint8)] if abi5 else []) + [
        ctypes.c_int32,  # n_threads (<= 0 = auto)
    ]
    if hasattr(lib, "vt_tensorize16_packed"):
        lib.vt_tensorize16_packed.restype = ctypes.c_int
        lib.vt_tensorize16_packed.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),  # rows_of
            ctypes.POINTER(ctypes.c_int32),  # cols_of
            ctypes.c_int64,                  # B
            ctypes.c_int32,                  # L
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_uint16),
        ] + ([ctypes.POINTER(ctypes.c_uint8)] if abi5 else []) + [
            ctypes.c_int32,                  # n_threads
        ]
    lib.vt_detok.restype = ctypes.c_int64
    lib.vt_detok.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int8),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int32,
    ]
    if hasattr(lib, "vt_detok_bits"):
        lib.vt_detok_bits.restype = ctypes.c_int64
        lib.vt_detok_bits.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),  # bits
            ctypes.c_int32,                  # bytes_per_row
            ctypes.POINTER(ctypes.c_int32),  # rows_of (nullable)
            ctypes.POINTER(ctypes.c_int32),  # cols_of (nullable)
            ctypes.c_int64,                  # max_gaps
            ctypes.POINTER(ctypes.c_uint8),  # out
            ctypes.c_int64,                  # out_cap
            ctypes.c_int32,                  # n_threads
        ]
    if hasattr(lib, "vt_host_serve_padded"):
        lib.vt_host_serve_padded.restype = ctypes.c_int
        lib.vt_host_serve_padded.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint16),  # cps (B, L)
            ctypes.POINTER(ctypes.c_int32),   # lengths
            ctypes.c_int64,                   # B
            ctypes.c_int32,                   # L
            ctypes.POINTER(ctypes.c_int32),   # ws_types
            ctypes.c_int32,                   # n_ws
            ctypes.POINTER(ctypes.c_int8),    # out_bnd
            ctypes.POINTER(ctypes.c_int32),   # out_scores (nullable)
            ctypes.POINTER(ctypes.c_int32),   # out_cm (nullable)
            ctypes.POINTER(ctypes.c_int32),   # out_tm (nullable)
            ctypes.c_int32,                   # n_threads
        ]
    if hasattr(lib, "vt_find_newlines"):
        lib.vt_find_newlines.restype = ctypes.c_int64
        lib.vt_find_newlines.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),  # out (nullable = count only)
        ]
    if hasattr(lib, "vt_count_chars"):
        lib.vt_count_chars.restype = None
        lib.vt_count_chars.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,  # n_threads (<= 0 = auto)
        ]
    if hasattr(lib, "vt_detok_scores"):
        lib.vt_detok_scores.restype = ctypes.c_int64
        lib.vt_detok_scores.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),   # utf8
            ctypes.POINTER(ctypes.c_int64),   # starts
            ctypes.POINTER(ctypes.c_int64),   # ends
            ctypes.c_int64,                   # n_lines
            ctypes.POINTER(ctypes.c_int8),    # bnd
            ctypes.c_int32,                   # Lm1
            ctypes.POINTER(ctypes.c_uint16),  # cps16 (normalized)
            ctypes.POINTER(ctypes.c_int32),   # lengths
            ctypes.POINTER(ctypes.c_int32),   # scores
            ctypes.POINTER(ctypes.c_uint8),   # out
            ctypes.c_int64,                   # out_cap
            ctypes.c_int32,                   # n_threads
        ]
    if hasattr(lib, "vt_detok_tags"):
        lib.vt_detok_tags.restype = ctypes.c_int64
        lib.vt_detok_tags.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),   # utf8
            ctypes.POINTER(ctypes.c_int64),   # starts
            ctypes.POINTER(ctypes.c_int64),   # ends
            ctypes.c_int64,                   # n_lines
            ctypes.POINTER(ctypes.c_int8),    # bnd
            ctypes.c_int32,                   # Lm1
            ctypes.POINTER(ctypes.c_int32),   # tid
            ctypes.POINTER(ctypes.c_int8),    # choice
            ctypes.c_int32,                   # n_slots
            ctypes.POINTER(ctypes.c_int64),   # ent_start
            ctypes.POINTER(ctypes.c_int32),   # ent_base
            ctypes.POINTER(ctypes.c_int32),   # ent_ccol
            ctypes.POINTER(ctypes.c_uint8),   # pool
            ctypes.POINTER(ctypes.c_int64),   # pool_off
            ctypes.c_int64,                   # max_tag_bytes
            ctypes.POINTER(ctypes.c_uint8),   # out
            ctypes.c_int64,                   # out_cap
            ctypes.c_int32,                   # n_threads
        ]
    if hasattr(lib, "vt_detok_scores2"):
        lib.vt_detok_scores2.restype = ctypes.c_int64
        lib.vt_detok_scores2.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),   # utf8
            ctypes.POINTER(ctypes.c_int64),   # starts
            ctypes.POINTER(ctypes.c_int64),   # ends
            ctypes.c_int64,                   # n_lines
            ctypes.POINTER(ctypes.c_uint8),   # bits
            ctypes.c_int32,                   # bytes_per_row
            ctypes.POINTER(ctypes.c_int32),   # rows_of (nullable)
            ctypes.POINTER(ctypes.c_int32),   # cols_of (nullable)
            ctypes.POINTER(ctypes.c_int32),   # counts
            ctypes.POINTER(ctypes.c_uint16),  # cps16
            ctypes.c_int32,                   # L
            ctypes.POINTER(ctypes.c_int32),   # scores
            ctypes.c_int32,                   # Lm1
            ctypes.POINTER(ctypes.c_uint8),   # out
            ctypes.c_int64,                   # out_cap
            ctypes.c_int32,                   # n_threads
        ]
    if hasattr(lib, "vt_detok_tags2"):
        lib.vt_detok_tags2.restype = ctypes.c_int64
        lib.vt_detok_tags2.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),   # utf8
            ctypes.POINTER(ctypes.c_int64),   # starts
            ctypes.POINTER(ctypes.c_int64),   # ends
            ctypes.c_int64,                   # n_lines
            ctypes.POINTER(ctypes.c_uint8),   # bits
            ctypes.c_int32,                   # bytes_per_row
            ctypes.POINTER(ctypes.c_int32),   # rows_of (nullable)
            ctypes.POINTER(ctypes.c_int32),   # cols_of (nullable)
            ctypes.POINTER(ctypes.c_int32),   # counts
            ctypes.c_void_p,                  # tid (int32/int16/int8)
            ctypes.c_int32,                   # tid_kind
            ctypes.c_int64,                   # L (tid/choice row width)
            ctypes.POINTER(ctypes.c_int8),    # choice
            ctypes.c_int32,                   # n_slots
            ctypes.POINTER(ctypes.c_int64),   # ent_start
            ctypes.POINTER(ctypes.c_int32),   # ent_base
            ctypes.POINTER(ctypes.c_int32),   # ent_ccol
            ctypes.POINTER(ctypes.c_uint8),   # pool
            ctypes.POINTER(ctypes.c_int64),   # pool_off
            ctypes.c_int64,                   # max_tag_bytes
            ctypes.POINTER(ctypes.c_uint16),  # cps16 (nullable)
            ctypes.POINTER(ctypes.c_int32),   # gap_scores (nullable)
            ctypes.c_int32,                   # Lm1
            ctypes.POINTER(ctypes.c_int32),   # tag_scores (nullable)
            ctypes.c_int32,                   # C
            ctypes.POINTER(ctypes.c_int64),   # ts_start (nullable)
            ctypes.POINTER(ctypes.c_int32),   # ts_base
            ctypes.POINTER(ctypes.c_int32),   # ts_cnt
            ctypes.POINTER(ctypes.c_int32),   # ts_koff
            ctypes.POINTER(ctypes.c_uint8),   # ts_pool
            ctypes.POINTER(ctypes.c_int64),   # ts_pool_off
            ctypes.c_int64,                   # ts_max_bytes
            ctypes.POINTER(ctypes.c_uint8),   # out
            ctypes.c_int64,                   # out_cap
            ctypes.c_int32,                   # n_threads
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
    I32P = ctypes.POINTER(ctypes.c_int32)
    I64P = ctypes.POINTER(ctypes.c_int64)
    PI32P = ctypes.POINTER(I32P)
    lib.vt_compile_matcher.restype = ctypes.c_int
    lib.vt_compile_matcher.argtypes = [
        I32P, I64P, ctypes.c_int64,  # patterns
        I32P, I32P, I64P,  # weights
        ctypes.c_int32, ctypes.c_int32,  # project, n_symbols_in
        PI32P, I64P,  # syms
        PI32P, PI32P, PI32P, PI32P, I64P,  # trie
        PI32P, PI32P, I64P,  # rows_first/cnt, n_merged
        PI32P, PI32P, I64P,  # w8, off, n_rows
        I32P, I32P,  # max_chunks, max_len
    ]
    U8P = ctypes.POINTER(ctypes.c_uint8)
    PI64P = ctypes.POINTER(I64P)
    lib.vt_host_new.restype = ctypes.c_void_p
    lib.vt_host_new.argtypes = [ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.vt_host_free.restype = None
    lib.vt_host_free.argtypes = [ctypes.c_void_p]
    _I32P = ctypes.POINTER(ctypes.c_int32)
    lib.vt_host_set_char.restype = ctypes.c_int
    lib.vt_host_set_char.argtypes = [
        ctypes.c_void_p,
        _I32P, _I32P, _I32P, ctypes.c_int64,  # base/check/inherit
        _I32P, _I32P, ctypes.c_int64,  # rows_first/cnt
        _I32P, _I32P, ctypes.c_int64,  # w8/off
        _I32P, ctypes.c_int64,  # sym_table
    ]
    lib.vt_host_set_type_cache.restype = ctypes.c_int
    lib.vt_host_set_type_cache.argtypes = [
        ctypes.c_void_p, _I32P, ctypes.c_int64, ctypes.c_int32,
    ]
    lib.vt_host_set_type_trie.restype = ctypes.c_int
    lib.vt_host_set_type_trie.argtypes = [
        ctypes.c_void_p,
        _I32P, _I32P, _I32P, ctypes.c_int64,
        _I32P, _I32P, ctypes.c_int64,
        _I32P, _I32P, ctypes.c_int64,
    ]
    lib.vt_host_predict.restype = ctypes.c_int
    lib.vt_host_predict.argtypes = [
        ctypes.c_void_p, _I32P, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, _I32P, _I32P, _I32P,
    ]
    _I64P = ctypes.POINTER(ctypes.c_int64)
    lib.vt_host_predict_batch.restype = ctypes.c_int
    lib.vt_host_predict_batch.argtypes = [
        ctypes.c_void_p, _I32P, ctypes.POINTER(ctypes.c_uint8),
        _I64P, ctypes.c_int64, _I64P,
        _I32P, _I32P, _I32P, ctypes.c_int32,
    ]
    lib.vt_tag_new.restype = ctypes.c_void_p
    lib.vt_tag_new.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        _I64P, _I32P, _I64P, _I32P,
    ]
    lib.vt_tag_free.restype = None
    lib.vt_tag_free.argtypes = [ctypes.c_void_p]
    lib.vt_tag_set_matcher.restype = ctypes.c_int
    lib.vt_tag_set_matcher.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
        _I64P, _I32P, _I64P, _I32P, ctypes.c_int64,
        _I32P, ctypes.c_int64,
    ]
    lib.vt_tag_set_tokens.restype = ctypes.c_int
    lib.vt_tag_set_tokens.argtypes = [ctypes.c_void_p, _I32P, _I64P]
    lib.vt_tag_set_assign.restype = ctypes.c_int
    lib.vt_tag_set_assign.argtypes = [
        ctypes.c_void_p, _I64P, _I32P, _I32P, _I32P,
    ]
    lib.vt_tag_predict_batch.restype = ctypes.c_int64
    lib.vt_tag_predict_batch.argtypes = [
        ctypes.c_void_p, _I32P, ctypes.POINTER(ctypes.c_uint8),
        _I64P, ctypes.c_int64, _I32P, _I32P,
        _I32P, _I32P, _I32P, _I32P, _I32P,
        _I64P, _I32P, _I64P,
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.vt_compile_matcher_tags.restype = ctypes.c_int
    lib.vt_compile_matcher_tags.argtypes = [
        I32P, I64P, ctypes.c_int64,  # patterns
        I32P, I32P, I64P,  # weights
        U8P, I32P, I32P,  # is_tag, tag_tok, tag_rel
        ctypes.c_int32, ctypes.c_int32,  # project, n_symbols_in
        PI32P, I64P,  # syms
        PI32P, PI32P, PI32P, PI32P, I64P,  # trie
        PI32P, PI32P, I64P,  # rows_first/cnt, n_merged
        PI32P, PI32P, I64P,  # w8, off, n_rows
        I32P, I32P,  # max_chunks, max_len
        PI32P, PI32P, PI32P, PI32P, PI64P, I64P,  # tag outputs
    ]
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


class NativeHostPredictor:
    """ctypes wrapper for the C++ host predictor (native/host_predictor.cc).

    Evaluates a :class:`CompiledModel`'s packed tables on CPU with results
    bit-identical to the device pipeline — the low-latency small-batch
    serving path and the analogue of the reference's embedded predictor
    (reference predictor.rs:639-664, examples/embedded_device/).

    Thread safety: ``predict_batch`` returns views into per-instance
    scratch buffers, overwritten by the next call; an internal lock
    serializes concurrent calls on one instance, but a caller holding a
    previous result across a later call still sees it overwritten — copy
    anything kept, or use one instance per thread.
    """

    def __init__(self, compiled):
        import threading

        lib = _load()
        if lib is None or not hasattr(lib, "vt_host_predict"):
            raise RuntimeError("native library unavailable")
        self._bufs = {}
        self._lock = threading.Lock()
        self._lib = lib
        c = compiled
        self.pad_left = int(c.pad_left)
        self.pad_right = int(c.pad_right)
        self.has_char = c.char_matcher is not None
        # the device path exposes per-position type states only for the
        # trie variant (the cache variant has no automaton states)
        self.has_type = (
            c.type_matcher is not None and c.type_cache_table is None
        )
        self._h = lib.vt_host_new(
            int(c.bias), self.pad_left, self.pad_right
        )
        I32P = ctypes.POINTER(ctypes.c_int32)

        def p32(a):
            return a.ctypes.data_as(I32P)

        # keep the contiguous copies alive for the duration of the setter
        # calls only — the C++ side copies everything it needs
        if c.char_matcher is not None:
            m = c.char_matcher
            arrs = [
                np.ascontiguousarray(x, dtype=np.int32)
                for x in (m.base, m.check, m.inherit, m.rows_first,
                          m.rows_cnt, m.w8, m.off, c.char_sym_table)
            ]
            rc = lib.vt_host_set_char(
                self._h,
                p32(arrs[0]), p32(arrs[1]), p32(arrs[2]), len(arrs[0]),
                p32(arrs[3]), p32(arrs[4]), len(arrs[3]),
                p32(arrs[5]), p32(arrs[6]), len(arrs[6]),
                p32(arrs[7]), len(arrs[7]),
            )
            if rc != 0:
                raise RuntimeError("host predictor char setup failed")
        if c.type_cache_table is not None:
            table = np.ascontiguousarray(c.type_cache_table, dtype=np.int32)
            lib.vt_host_set_type_cache(
                self._h, p32(table), len(table), int(c.type_window_size)
            )
        elif c.type_matcher is not None:
            m = c.type_matcher
            arrs = [
                np.ascontiguousarray(x, dtype=np.int32)
                for x in (m.base, m.check, m.inherit, m.rows_first,
                          m.rows_cnt, m.w8, m.off)
            ]
            rc = lib.vt_host_set_type_trie(
                self._h,
                p32(arrs[0]), p32(arrs[1]), p32(arrs[2]), len(arrs[0]),
                p32(arrs[3]), p32(arrs[4]), len(arrs[3]),
                p32(arrs[5]), p32(arrs[6]), len(arrs[6]),
            )
            if rc != 0:
                raise RuntimeError("host predictor type setup failed")

    def predict(self, codepoints: np.ndarray, char_types: np.ndarray):
        """Score one sentence: returns (padded_scores, char_match,
        type_match) int32 arrays, same layout as the device path."""
        n = len(codepoints)
        cps = np.ascontiguousarray(codepoints, dtype=np.int32)
        cts = np.ascontiguousarray(char_types, dtype=np.uint8)
        S = self.pad_left + max(n - 1, 0) + self.pad_right
        scores = np.empty(S, dtype=np.int32)
        char_match = np.empty(max(n, 1), dtype=np.int32)
        type_match = np.empty(max(n, 1), dtype=np.int32)
        I32P = ctypes.POINTER(ctypes.c_int32)
        rc = self._lib.vt_host_predict(
            self._h,
            cps.ctypes.data_as(I32P) if n else char_match.ctypes.data_as(I32P),
            cts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            if n
            else ctypes.cast(type_match.ctypes.data_as(I32P),
                             ctypes.POINTER(ctypes.c_uint8)),
            n,
            scores.ctypes.data_as(I32P),
            char_match.ctypes.data_as(I32P),
            type_match.ctypes.data_as(I32P),
        )
        if rc != 0:
            raise RuntimeError("host predict failed")
        return (
            scores,
            char_match[:n] if self.has_char else None,
            type_match[:n] if self.has_type else None,
        )

    def _scratch(self, name: str, size: int, dtype) -> np.ndarray:
        """Reused per-instance output buffer. Without reuse, every call
        allocates ~13 MB of fresh pages (measured: page-fault + zeroing
        churn cut host throughput ~3x once the process allocator
        fragments); with reuse the pages stay mapped and warm."""
        buf = self._bufs.get(name)
        if buf is None or buf.size < size:
            buf = np.empty(max(int(size * 5 // 4) + 16, 64), dtype=dtype)
            self._bufs[name] = buf
        return buf[:size]

    def predict_batch(self, cps_list, cts_list, n_threads: int = 0):
        """Score many sentences in one native call (worker threads inside).

        Returns (scores_flat, score_offsets, char_match_flat,
        type_match_flat, offsets): line i's padded scores are
        ``scores_flat[score_offsets[i]:score_offsets[i+1]]`` and its match
        states ``*_flat[offsets[i]:offsets[i+1]]``.

        The returned arrays are views into per-instance scratch buffers
        and are OVERWRITTEN by the next call — copy anything kept (the
        predictor's `predict_host_batch` does). Concurrent calls on one
        instance are serialized by ``self._lock`` (see class docstring).
        """
        with self._lock:
            return self._predict_batch_locked(cps_list, cts_list, n_threads)

    def serve_padded(self, cps, lengths, ws_types=(), want_scores=False,
                     want_states=False, n_threads: int = 0):
        """One-call lean host serving over a padded (B, L) uint16 batch:
        returns int8 gap labels (B, L-1) [+ int32 gap scores]
        [+ (char_match, type_match) padded state rows] — the C++ twin of
        the device serve kernel (vt_host_serve_padded)."""
        if not hasattr(self._lib, "vt_host_serve_padded"):
            return None
        cps = np.ascontiguousarray(cps, dtype=np.uint16)
        lengths = np.ascontiguousarray(lengths, dtype=np.int32)
        B, L = cps.shape
        ws = np.asarray(sorted(ws_types), dtype=np.int32)
        bnd = np.empty((B, max(L - 1, 0)), dtype=np.int8)
        sc = (
            np.empty((B, max(L - 1, 0)), dtype=np.int32)
            if want_scores else None
        )
        cm = np.empty((B, L), dtype=np.int32) if want_states else None
        tm = np.empty((B, L), dtype=np.int32) if want_states else None
        I32P = ctypes.POINTER(ctypes.c_int32)
        with self._lock:
            rc = self._lib.vt_host_serve_padded(
                self._h,
                cps.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                lengths.ctypes.data_as(I32P),
                B,
                L,
                ws.ctypes.data_as(I32P) if len(ws) else None,
                len(ws),
                bnd.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                sc.ctypes.data_as(I32P) if sc is not None else None,
                cm.ctypes.data_as(I32P) if cm is not None else None,
                tm.ctypes.data_as(I32P) if tm is not None else None,
                n_threads,
            )
        if rc != 0:
            return None
        out = [bnd]
        if want_scores:
            out.append(sc)
        if want_states:
            out.append((cm, tm))
        return out[0] if len(out) == 1 else tuple(out)

    def predict_flat(self, cps_flat, cts_flat, offsets,
                     n_threads: int = 0):
        """Like :meth:`predict_batch` but over already-flattened streams
        (``offsets``: n+1 int64 prefix sums) — the lean host serving
        path's entry, skipping the per-sentence Python packing loop."""
        with self._lock:
            return self._predict_flat_locked(
                np.ascontiguousarray(cps_flat, dtype=np.int32),
                np.ascontiguousarray(cts_flat, dtype=np.uint8),
                np.ascontiguousarray(offsets, dtype=np.int64),
                n_threads,
            )

    def _predict_batch_locked(self, cps_list, cts_list, n_threads: int = 0):
        n = len(cps_list)
        lens = np.fromiter((len(c) for c in cps_list), np.int64, n)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        total = int(offsets[-1])
        cps_flat = self._scratch("cps", max(total, 1), np.int32)
        cts_flat = self._scratch("cts", max(total, 1), np.uint8)
        for i, (c, t) in enumerate(zip(cps_list, cts_list)):
            cps_flat[offsets[i] : offsets[i + 1]] = c
            cts_flat[offsets[i] : offsets[i + 1]] = t
        return self._predict_flat_locked(
            cps_flat, cts_flat, offsets, n_threads
        )

    def _predict_flat_locked(self, cps_flat, cts_flat, offsets,
                             n_threads: int = 0):
        n = len(offsets) - 1
        lens = offsets[1:] - offsets[:-1]
        s_sizes = self.pad_left + np.maximum(lens - 1, 0) + self.pad_right
        score_offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(s_sizes, out=score_offsets[1:])
        total = int(offsets[-1])
        if total == 0:
            cps_flat = self._scratch("cps", 1, np.int32)
            cts_flat = self._scratch("cts", 1, np.uint8)
        scores_flat = self._scratch(
            "scores", max(int(score_offsets[-1]), 1), np.int32
        )
        char_flat = self._scratch("char", max(total, 1), np.int32)
        type_flat = self._scratch("type", max(total, 1), np.int32)
        I32P = ctypes.POINTER(ctypes.c_int32)
        I64P = ctypes.POINTER(ctypes.c_int64)
        rc = self._lib.vt_host_predict_batch(
            self._h,
            cps_flat.ctypes.data_as(I32P),
            cts_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offsets.ctypes.data_as(I64P),
            n,
            score_offsets.ctypes.data_as(I64P),
            scores_flat.ctypes.data_as(I32P),
            char_flat.ctypes.data_as(I32P),
            type_flat.ctypes.data_as(I32P),
            n_threads,
        )
        if rc != 0:
            raise RuntimeError("host batch predict failed")
        return scores_flat, score_offsets, char_flat, type_flat, offsets

    def __del__(self):
        try:
            self._lib.vt_host_free(self._h)
        except Exception:
            pass


class NativeTagScorer:
    """ctypes wrapper for the C++ batched tag scorer (native/tag_scorer.cc).

    Scores and argmaxes every recognized token of a batch in one call over
    flat packed tables — the fast path for ``--predict-tags`` (reference
    predictor.rs:546-637 semantics; the Python fallback lives in
    predictor._tag_token).
    """

    def __init__(self, compiled):
        lib = _load()
        if lib is None or not hasattr(lib, "vt_tag_new"):
            raise RuntimeError("native library unavailable")
        self._lib = lib
        meta = compiled.tag_meta
        n_tokens = len(meta.bias)
        self.n_tags = int(compiled.n_tags)
        bias_off = np.zeros(n_tokens + 1, dtype=np.int64)
        for i, b in enumerate(meta.bias):
            bias_off[i + 1] = bias_off[i] + len(b)
        bias_flat = np.fromiter(
            itertools.chain.from_iterable(meta.bias),
            dtype=np.int32,
            count=int(bias_off[-1]),
        )
        cand_off = np.zeros(n_tokens + 1, dtype=np.int64)
        for i, slots in enumerate(meta.tags):
            cand_off[i + 1] = cand_off[i] + len(slots)
        cand_cnt = np.fromiter(
            (len(c) for slots in meta.tags for c in slots),
            dtype=np.int32,
            count=int(cand_off[-1]),
        )
        self.max_cap = 8
        for i in range(n_tokens):
            bl = int(bias_off[i + 1] - bias_off[i])
            if bl > self.max_cap:
                self.max_cap = bl
        if bias_flat.size == 0:
            bias_flat = np.zeros(1, dtype=np.int32)
        if cand_cnt.size == 0:
            cand_cnt = np.zeros(1, dtype=np.int32)
        I32P = ctypes.POINTER(ctypes.c_int32)
        I64P = ctypes.POINTER(ctypes.c_int64)
        self._h = lib.vt_tag_new(
            n_tokens, self.n_tags, self.max_cap,
            bias_off.ctypes.data_as(I64P),
            bias_flat.ctypes.data_as(I32P),
            cand_off.ctypes.data_as(I64P),
            cand_cnt.ctypes.data_as(I32P),
        )
        tokens = sorted(meta.token_ids, key=meta.token_ids.get)
        tok_offs = np.zeros(n_tokens + 1, dtype=np.int64)
        for i, t in enumerate(tokens):
            tok_offs[i + 1] = tok_offs[i] + len(t)
        tok_cps = np.fromiter(
            (ord(ch) for t in tokens for ch in t),
            dtype=np.int32,
            count=int(tok_offs[-1]),
        )
        if tok_cps.size == 0:
            tok_cps = np.zeros(1, dtype=np.int32)
        lib.vt_tag_set_tokens(
            self._h,
            tok_cps.ctypes.data_as(I32P),
            tok_offs.ctypes.data_as(I64P),
        )
        # assignment plan: per token_id the tag slots to fill, each
        # resolving to an index into a shared candidate-string pool (pool
        # index 0 = None for empty-candidate slots)
        pool: list = [None]
        ent_start = np.zeros(n_tokens + 1, dtype=np.int64)
        ent_slot: list = []
        ent_base: list = []
        ent_ccol: list = []
        for tid, slots_ in enumerate(meta.tags):
            for slot, cands in enumerate(slots_):
                if slot >= self.n_tags:
                    break
                ent_slot.append(slot)
                if len(cands) >= 2:
                    ent_base.append(len(pool))
                    ent_ccol.append(slot)
                    pool.extend(cands)
                elif cands:
                    ent_base.append(len(pool))
                    ent_ccol.append(-1)
                    pool.append(cands[0])
                else:
                    ent_base.append(0)
                    ent_ccol.append(-1)
            ent_start[tid + 1] = len(ent_slot)
        self.pool = np.array(pool, dtype=object)
        ent_slot_a = np.asarray(ent_slot or [0], dtype=np.int32)
        ent_base_a = np.asarray(ent_base or [0], dtype=np.int32)
        ent_ccol_a = np.asarray(ent_ccol or [0], dtype=np.int32)
        lib.vt_tag_set_assign(
            self._h,
            ent_start.ctypes.data_as(I64P),
            ent_slot_a.ctypes.data_as(I32P),
            ent_base_a.ctypes.data_as(I32P),
            ent_ccol_a.ctypes.data_as(I32P),
        )
        self.has_char = False
        self.has_type = False
        for which, m in ((0, compiled.char_matcher),
                         (1, compiled.type_matcher)):
            if m is None or m.tag_weight is None or n_tokens == 0:
                continue
            n_rel = max((len(by_rel) for by_rel in m.tag_weight), default=0)
            if n_rel == 0:
                continue
            grp_first = np.zeros(n_tokens * n_rel + 1, dtype=np.int64)
            states: list = []
            w_off: list = []
            w_len: list = []
            w_flat: list = []
            for tid in range(n_tokens):
                by_rel = m.tag_weight[tid]
                for rel in range(n_rel):
                    table = by_rel[rel] if rel < len(by_rel) else {}
                    for st in sorted(table):
                        w = table[st]
                        states.append(st)
                        w_off.append(len(w_flat))
                        w_len.append(len(w))
                        w_flat.extend(w)
                    grp_first[tid * n_rel + rel + 1] = len(states)
            states_a = np.asarray(states or [0], dtype=np.int32)
            w_off_a = np.asarray(w_off or [0], dtype=np.int64)
            w_len_a = np.asarray(w_len or [0], dtype=np.int32)
            w_flat_a = np.asarray(w_flat or [0], dtype=np.int32)
            rc = lib.vt_tag_set_matcher(
                self._h, which, n_rel,
                grp_first.ctypes.data_as(I64P),
                states_a.ctypes.data_as(I32P),
                w_off_a.ctypes.data_as(I64P),
                w_len_a.ctypes.data_as(I32P),
                len(states),
                w_flat_a.ctypes.data_as(I32P),
                len(w_flat),
            )
            if rc != 0:
                raise RuntimeError("tag scorer setup failed")
            if which == 0:
                self.has_char = True
            else:
                self.has_type = True

    def predict_batch(self, cps_flat, bnd_flat, sent_off, char_states,
                      type_states, want_scores: bool = False,
                      n_threads: int = 0):
        """Run the full tag pass natively over a batch.

        ``cps_flat``/``bnd_flat``/``char_states``/``type_states``:
        flattened per-sentence streams delimited by ``sent_off`` (boundary
        labels occupy the first n-1 slots of each sentence's range; state
        streams may be None when the side is absent).

        Returns (tids, pos, sent, choices, scores-or-None, gpos, pool_idx),
        one row per recognized token. choices[t, s] = argmax candidate
        index for multi-candidate slots, -1 for single-candidate ones.
        (gpos, pool_idx) resolve the whole batch's tag assignment in flat
        form: ``all_tags[gpos] = self.pool[pool_idx]`` where all_tags is
        the batch-concatenated ``total_chars * n_tags`` tag array.
        """
        I32P = ctypes.POINTER(ctypes.c_int32)
        I64P = ctypes.POINTER(ctypes.c_int64)
        U8P = ctypes.POINTER(ctypes.c_uint8)
        cps_flat = np.ascontiguousarray(cps_flat, dtype=np.int32)
        bnd_flat = np.ascontiguousarray(bnd_flat, dtype=np.uint8)
        sent_off = np.ascontiguousarray(sent_off, dtype=np.int64)
        n_sents = len(sent_off) - 1
        cap = max(int(sent_off[-1]), 1)  # at most one token per char
        tids = np.empty(cap, dtype=np.int32)
        pos = np.empty(cap, dtype=np.int32)
        sent = np.empty(cap, dtype=np.int32)
        choices = np.empty((cap, self.n_tags), dtype=np.int32)
        gpos = np.empty(cap * self.n_tags, dtype=np.int64)
        pool_idx = np.empty(cap * self.n_tags, dtype=np.int32)
        n_entries = ctypes.c_int64(0)
        scores = (
            np.empty((cap, self.max_cap), dtype=np.int32)
            if want_scores
            else np.empty((1, 1), dtype=np.int32)
        )
        cs = None
        if char_states is not None and self.has_char:
            cs = np.ascontiguousarray(char_states, dtype=np.int32)
        ts = None
        if type_states is not None and self.has_type:
            ts = np.ascontiguousarray(type_states, dtype=np.int32)
        n_tok = self._lib.vt_tag_predict_batch(
            self._h,
            cps_flat.ctypes.data_as(I32P),
            bnd_flat.ctypes.data_as(U8P),
            sent_off.ctypes.data_as(I64P),
            n_sents,
            cs.ctypes.data_as(I32P) if cs is not None else None,
            ts.ctypes.data_as(I32P) if ts is not None else None,
            tids.ctypes.data_as(I32P),
            pos.ctypes.data_as(I32P),
            sent.ctypes.data_as(I32P),
            choices.ctypes.data_as(I32P),
            scores.ctypes.data_as(I32P),
            gpos.ctypes.data_as(I64P),
            pool_idx.ctypes.data_as(I32P),
            ctypes.byref(n_entries),
            1 if want_scores else 0,
            n_threads,
        )
        ne = n_entries.value
        return (
            tids[:n_tok], pos[:n_tok], sent[:n_tok], choices[:n_tok],
            scores[:n_tok] if want_scores else None,
            gpos[:ne], pool_idx[:ne],
        )

    def __del__(self):
        try:
            self._lib.vt_tag_free(self._h)
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
    n = len(patterns)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(
        np.fromiter(map(len, patterns), dtype=np.int64, count=n),
        out=offsets[1:],
    )
    flat = np.fromiter(
        itertools.chain.from_iterable(patterns),
        dtype=np.int32,
        count=int(offsets[-1]),
    )
    if flat.size == 0:
        flat = np.zeros(1, dtype=np.int32)
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


def compile_matcher_native(
    pat_flat: np.ndarray,
    pat_offs: np.ndarray,
    w_offset: np.ndarray,
    w_flat: np.ndarray,
    w_offs: np.ndarray,
    *,
    project: bool = True,
    n_symbols: int = 0,
    is_tag: Optional[np.ndarray] = None,
    tag_tok: Optional[np.ndarray] = None,
    tag_rel: Optional[np.ndarray] = None,
) -> Optional[dict]:
    """One-call native matcher compile: merge duplicate patterns, propagate
    suffix weights, project symbols, build the double-array, pack fixed-8
    weight rows (native/compile_matcher.cc). Returns a dict of numpy arrays
    or None when the library is unavailable.

    When ``is_tag`` is given, rows with ``is_tag[i] != 0`` carry a tag
    weight vector for ``(tag_tok[i], tag_rel[i])`` instead of a boundary
    weight, and the result dict gains ``tag_pat/tag_tok/tag_rel/tag_wflat/
    tag_woffs`` arrays describing the merged patterns' tag entries.

    Raises OverflowError on int32 weight overflow (the Python path raises
    invalid_model; the caller translates).
    """
    lib = _load()
    if lib is None or not hasattr(lib, "vt_compile_matcher"):
        return None
    n = int(len(pat_offs) - 1)
    pat_flat = np.ascontiguousarray(pat_flat, dtype=np.int32)
    pat_offs = np.ascontiguousarray(pat_offs, dtype=np.int64)
    w_offset = np.ascontiguousarray(w_offset, dtype=np.int32)
    w_flat = np.ascontiguousarray(w_flat, dtype=np.int32)
    w_offs = np.ascontiguousarray(w_offs, dtype=np.int64)
    if pat_flat.size == 0:
        pat_flat = np.zeros(1, dtype=np.int32)
    if w_flat.size == 0:
        w_flat = np.zeros(1, dtype=np.int32)
    if w_offset.size == 0:
        w_offset = np.zeros(1, dtype=np.int32)
    I32P = ctypes.POINTER(ctypes.c_int32)
    I64P = ctypes.POINTER(ctypes.c_int64)
    ptrs = [I32P() for _ in range(9)]  # syms,base,check,value,inherit,rf,rc,w8,off
    n_syms = ctypes.c_int64()
    n_slots = ctypes.c_int64()
    n_merged = ctypes.c_int64()
    n_rows = ctypes.c_int64()
    max_chunks = ctypes.c_int32()
    max_len = ctypes.c_int32()
    common = (
        pat_flat.ctypes.data_as(I32P),
        pat_offs.ctypes.data_as(I64P),
        n,
        w_offset.ctypes.data_as(I32P),
        w_flat.ctypes.data_as(I32P),
        w_offs.ctypes.data_as(I64P),
    )
    outs = (
        ctypes.byref(ptrs[0]), ctypes.byref(n_syms),
        ctypes.byref(ptrs[1]), ctypes.byref(ptrs[2]), ctypes.byref(ptrs[3]),
        ctypes.byref(ptrs[4]), ctypes.byref(n_slots),
        ctypes.byref(ptrs[5]), ctypes.byref(ptrs[6]), ctypes.byref(n_merged),
        ctypes.byref(ptrs[7]), ctypes.byref(ptrs[8]), ctypes.byref(n_rows),
        ctypes.byref(max_chunks), ctypes.byref(max_len),
    )
    tag_ptrs = None
    if is_tag is not None:
        if not hasattr(lib, "vt_compile_matcher_tags"):
            return None
        is_tag = np.ascontiguousarray(is_tag, dtype=np.uint8)
        tag_tok = np.ascontiguousarray(tag_tok, dtype=np.int32)
        tag_rel = np.ascontiguousarray(tag_rel, dtype=np.int32)
        for a in (is_tag, tag_tok, tag_rel):
            assert len(a) == n
        tag_ptrs = [I32P(), I32P(), I32P(), I32P()]
        tag_woffs_p = I64P()
        n_tag = ctypes.c_int64()
        rc = lib.vt_compile_matcher_tags(
            *common,
            is_tag.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            tag_tok.ctypes.data_as(I32P),
            tag_rel.ctypes.data_as(I32P),
            1 if project else 0,
            n_symbols,
            *outs,
            ctypes.byref(tag_ptrs[0]), ctypes.byref(tag_ptrs[1]),
            ctypes.byref(tag_ptrs[2]), ctypes.byref(tag_ptrs[3]),
            ctypes.byref(tag_woffs_p), ctypes.byref(n_tag),
        )
    else:
        rc = lib.vt_compile_matcher(
            *common,
            1 if project else 0,
            n_symbols,
            *outs,
        )
    if rc == 3:
        raise OverflowError("weight overflow during merge")
    if rc != 0:
        return None

    def take(p, shape):
        a = np.ctypeslib.as_array(p, shape=shape).copy()
        lib.vt_free(p)
        return a

    out = {
        "syms": take(ptrs[0], (max(int(n_syms.value), 1),))[: n_syms.value],
        "base": take(ptrs[1], (int(n_slots.value),)),
        "check": take(ptrs[2], (int(n_slots.value),)),
        "value": take(ptrs[3], (int(n_slots.value),)),
        "inherit": take(ptrs[4], (int(n_slots.value),)),
        "rows_first": take(ptrs[5], (max(int(n_merged.value), 1),))[
            : n_merged.value
        ],
        "rows_cnt": take(ptrs[6], (max(int(n_merged.value), 1),))[
            : n_merged.value
        ],
        "w8": take(ptrs[7], (int(n_rows.value), 8)),
        "off": take(ptrs[8], (int(n_rows.value),)),
        "max_chunks": int(max_chunks.value),
        "max_len": int(max_len.value),
        "n_symbols": int(n_syms.value) if project else n_symbols,
    }
    if tag_ptrs is not None:
        k = int(n_tag.value)
        out["tag_pat"] = take(tag_ptrs[0], (max(k, 1),))[:k]
        out["tag_tok"] = take(tag_ptrs[1], (max(k, 1),))[:k]
        out["tag_rel"] = take(tag_ptrs[2], (max(k, 1),))[:k]
        woffs = np.ctypeslib.as_array(tag_woffs_p, shape=(k + 1,)).copy()
        lib.vt_free(tag_woffs_p)
        nw = int(woffs[-1]) if k else 0
        out["tag_wflat"] = take(tag_ptrs[3], (max(nw, 1),))[:nw]
        out["tag_woffs"] = woffs
    return out


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


def tensorize16_native(
    blob: np.ndarray,  # uint8 UTF-8 bytes (lines need not be contiguous)
    starts: np.ndarray,  # int64 (n_lines,) line start byte offsets
    ends: np.ndarray,  # int64 (n_lines,) line end byte offsets
    L: int,
    norm_map: Optional[np.ndarray] = None,  # uint16[65536] codepoint map
    n_threads: int = 0,  # <= 0 picks hardware concurrency
    want_types: bool = False,
):
    """Lean uint16 tensorizer with fused normalization.

    Returns (cps uint16 (n, L), lengths int32) — plus the uint8 char
    types of the normalized codepoints when ``want_types`` (padding 0;
    feeds the serve kernels' host-types variant) — or None when the
    batch needs the general path (astral chars, lines longer than L,
    invalid UTF-8, or no native library).
    """
    lib = _load()
    if lib is None:
        return None
    abi5 = hasattr(lib, "vt_abi_version")
    if want_types and not abi5:
        return None  # stale pre-round-5 library cannot emit types
    n = len(starts)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    cps = np.empty((n, L), dtype=np.uint16)
    lengths = np.empty(n, dtype=np.int32)
    types = np.empty((n, L), dtype=np.uint8) if want_types else None
    U8P = ctypes.POINTER(ctypes.c_uint8)
    U16P = ctypes.POINTER(ctypes.c_uint16)
    I64P = ctypes.POINTER(ctypes.c_int64)
    buf = blob if blob.size else np.zeros(1, dtype=np.uint8)
    args = [
        buf.ctypes.data_as(U8P),
        starts.ctypes.data_as(I64P),
        ends.ctypes.data_as(I64P),
        n,
        L,
        norm_map.ctypes.data_as(U16P) if norm_map is not None else None,
        cps.ctypes.data_as(U16P),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    ]
    if abi5:
        args.append(types.ctypes.data_as(U8P) if types is not None
                    else None)
    args.append(n_threads)
    rc = lib.vt_tensorize16(*args)
    if rc != 0:
        return None
    if want_types:
        return cps, lengths, types
    return cps, lengths


def tensorize16_packed_native(
    blob: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    rows_of: np.ndarray,  # int32 (n_lines,) destination row per line
    cols_of: np.ndarray,  # int32 (n_lines,) destination column per line
    B: int,
    L: int,
    norm_map: Optional[np.ndarray] = None,
    n_threads: int = 0,
    want_types: bool = False,
):
    """Packed lean tensorizer: decodes line i at (rows_of[i], cols_of[i])
    of a zeroed (B, L) uint16 batch — the short-line packing layout;
    ``want_types`` additionally returns the uint8 char types at the
    same placement (separators 0). Returns cps (or (cps, types)), or
    None when the batch needs another path (astral/NUL/invalid UTF-8/
    overflow, or no native support)."""
    lib = _load()
    if lib is None or not hasattr(lib, "vt_tensorize16_packed"):
        return None
    abi5 = hasattr(lib, "vt_abi_version")
    if want_types and not abi5:
        return None  # stale pre-round-5 library cannot emit types
    n = len(starts)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    rows_of = np.ascontiguousarray(rows_of, dtype=np.int32)
    cols_of = np.ascontiguousarray(cols_of, dtype=np.int32)
    cps = np.empty((B, L), dtype=np.uint16)
    types = np.empty((B, L), dtype=np.uint8) if want_types else None
    U8P = ctypes.POINTER(ctypes.c_uint8)
    U16P = ctypes.POINTER(ctypes.c_uint16)
    I64P = ctypes.POINTER(ctypes.c_int64)
    I32P = ctypes.POINTER(ctypes.c_int32)
    buf = blob if blob.size else np.zeros(1, dtype=np.uint8)
    args = [
        buf.ctypes.data_as(U8P),
        starts.ctypes.data_as(I64P),
        ends.ctypes.data_as(I64P),
        n,
        rows_of.ctypes.data_as(I32P),
        cols_of.ctypes.data_as(I32P),
        B,
        L,
        norm_map.ctypes.data_as(U16P) if norm_map is not None else None,
        cps.ctypes.data_as(U16P),
    ]
    if abi5:
        args.append(types.ctypes.data_as(U8P) if types is not None
                    else None)
    args.append(n_threads)
    rc = lib.vt_tensorize16_packed(*args)
    if rc != 0:
        return None
    if want_types:
        return cps, types
    return cps


class TagEmitPlan:
    """Host emission plan for the lean device tag path.

    Precomputes, per token id, the '/'-separated tag blocks the tokenized
    writer appends after the surface (reference sentence.rs:850-886 with
    TagPredictor::predict resolution, predictor.rs:286-304): one entry
    per slot up to the token's last non-None slot (trailing-None
    truncation is static per token — multi/single-candidate slots always
    yield a tag, empty slots never do). Pool strings are pre-escaped.
    """

    def __init__(self, tag_meta, n_tags: int):
        def esc(s: str) -> bytes:
            out = []
            for ch in s:
                if ch in (" ", "\\", "/"):
                    out.append("\\")
                out.append(ch)
            return "".join(out).encode("utf-8")

        pool: list = []
        pool_off = [0]

        def add_pool(b: bytes) -> int:
            pool.append(b)
            pool_off.append(pool_off[-1] + len(b))
            return len(pool) - 1

        n_tokens = len(tag_meta.tags)
        ent_start = np.zeros(n_tokens + 1, dtype=np.int64)
        ent_base: list = []
        ent_ccol: list = []
        self.max_tag_bytes = 0
        for tid, slots in enumerate(tag_meta.tags):
            last_some = 0
            for s, cands in enumerate(slots):
                if s >= n_tags:
                    break
                if len(cands) > 0:
                    last_some = s + 1
            tok_bytes = 0
            for s in range(last_some):
                cands = slots[s]
                if len(cands) >= 2:
                    ent_base.append(len(pool))
                    ent_ccol.append(s)
                    longest = 0
                    for c in cands:
                        b = esc(c)
                        add_pool(b)
                        longest = max(longest, len(b))
                    tok_bytes += 1 + longest
                elif cands:
                    b = esc(cands[0])
                    ent_base.append(add_pool(b))
                    ent_ccol.append(-1)
                    tok_bytes += 1 + len(b)
                else:
                    ent_base.append(-1)
                    ent_ccol.append(-1)
                    tok_bytes += 1
            ent_start[tid + 1] = len(ent_base)
            self.max_tag_bytes = max(self.max_tag_bytes, tok_bytes)
        self.ent_start = ent_start
        self.ent_base = np.asarray(ent_base or [0], dtype=np.int32)
        self.ent_ccol = np.asarray(ent_ccol or [0], dtype=np.int32)
        self.pool = np.frombuffer(
            b"".join(pool) or b"\x00", dtype=np.uint8
        )
        self.pool_off = np.asarray(pool_off, dtype=np.int64)


def detok_tags_native(
    blob: np.ndarray,  # uint8 ORIGINAL UTF-8 bytes
    starts: np.ndarray,  # int64 (n_lines,)
    ends: np.ndarray,  # int64 (n_lines,)
    boundaries: np.ndarray,  # int8 (n_lines, L-1)
    tid: np.ndarray,  # int32 (n_lines, L)
    choice: np.ndarray,  # int8 (n_lines, L, n_slots)
    plan: TagEmitPlan,
    n_threads: int = 0,
) -> Optional[bytes]:
    """Tokenized-text writer with tags (lean --predict-tags path)."""
    lib = _load()
    if lib is None or not hasattr(lib, "vt_detok_tags"):
        return None
    n = len(starts)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    boundaries = np.ascontiguousarray(boundaries, dtype=np.int8)
    tid = np.ascontiguousarray(tid, dtype=np.int32)
    choice = np.ascontiguousarray(choice, dtype=np.int8)
    Lm1 = boundaries.shape[1]
    n_slots = choice.shape[2]
    total = int((ends - starts).sum())
    n_tok_max = int((boundaries == 1).sum()) + n
    cap = 2 * total + n * (Lm1 + 1) + n_tok_max * plan.max_tag_bytes + 1
    out = np.empty(cap, dtype=np.uint8)
    buf = blob if blob.size else np.zeros(1, dtype=np.uint8)
    U8P = ctypes.POINTER(ctypes.c_uint8)
    I8P = ctypes.POINTER(ctypes.c_int8)
    I32P = ctypes.POINTER(ctypes.c_int32)
    I64P = ctypes.POINTER(ctypes.c_int64)
    written = lib.vt_detok_tags(
        buf.ctypes.data_as(U8P),
        starts.ctypes.data_as(I64P),
        ends.ctypes.data_as(I64P),
        n,
        boundaries.ctypes.data_as(I8P),
        Lm1,
        tid.ctypes.data_as(I32P),
        choice.ctypes.data_as(I8P),
        n_slots,
        plan.ent_start.ctypes.data_as(I64P),
        plan.ent_base.ctypes.data_as(I32P),
        plan.ent_ccol.ctypes.data_as(I32P),
        plan.pool.ctypes.data_as(U8P),
        plan.pool_off.ctypes.data_as(I64P),
        plan.max_tag_bytes,
        out.ctypes.data_as(U8P),
        cap,
        n_threads,
    )
    if written < 0:
        return None
    return out[:written].tobytes()


def scores_detok_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "vt_detok_scores")


def find_newlines_native(blob: np.ndarray) -> Optional[np.ndarray]:
    """int64 positions of every 0x0A byte in ``blob`` (memchr-based; see
    vt_find_newlines), or None without native support."""
    lib = _load()
    if lib is None or not hasattr(lib, "vt_find_newlines"):
        return None
    buf = blob if blob.size else np.zeros(1, dtype=np.uint8)
    U8P = ctypes.POINTER(ctypes.c_uint8)
    n = lib.vt_find_newlines(buf.ctypes.data_as(U8P), len(blob), None)
    out = np.empty(n, dtype=np.int64)
    if n:
        lib.vt_find_newlines(
            buf.ctypes.data_as(U8P), len(blob),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    return out


def count_chars_native(
    blob: np.ndarray, starts: np.ndarray, ends: np.ndarray,
    n_threads: int = 0,
) -> Optional[np.ndarray]:
    """Per-line UTF-8 char counts (int32), or None without the lib."""
    lib = _load()
    if lib is None or not hasattr(lib, "vt_count_chars"):
        return None
    n = len(starts)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    counts = np.empty(n, dtype=np.int32)
    buf = blob if blob.size else np.zeros(1, dtype=np.uint8)
    I64P = ctypes.POINTER(ctypes.c_int64)
    lib.vt_count_chars(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        starts.ctypes.data_as(I64P),
        ends.ctypes.data_as(I64P),
        n,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    return counts


def detok_scores_native(
    blob: np.ndarray,  # uint8 ORIGINAL UTF-8 bytes
    starts: np.ndarray,  # int64 (n_lines,)
    ends: np.ndarray,  # int64 (n_lines,)
    boundaries: np.ndarray,  # int8 (n_lines, L-1)
    cps16: np.ndarray,  # uint16 (n_lines, L) NORMALIZED codepoints
    lengths: np.ndarray,  # int32 (n_lines,)
    scores: np.ndarray,  # int32 (n_lines, L-1) raw gap scores
    n_threads: int = 0,
) -> Optional[bytes]:
    """Tokenized-text + per-gap score writer (lean --scores path)."""
    lib = _load()
    if lib is None or not hasattr(lib, "vt_detok_scores"):
        return None
    n = len(starts)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    boundaries = np.ascontiguousarray(boundaries, dtype=np.int8)
    cps16 = np.ascontiguousarray(cps16, dtype=np.uint16)
    lengths = np.ascontiguousarray(lengths, dtype=np.int32)
    scores = np.ascontiguousarray(scores, dtype=np.int32)
    Lm1 = boundaries.shape[1]
    total = int((ends - starts).sum())
    cap = 2 * total + n * (Lm1 + 2) + n * Lm1 * 30 + 1
    out = np.empty(cap, dtype=np.uint8)
    buf = blob if blob.size else np.zeros(1, dtype=np.uint8)
    U8P = ctypes.POINTER(ctypes.c_uint8)
    I32P = ctypes.POINTER(ctypes.c_int32)
    I64P = ctypes.POINTER(ctypes.c_int64)
    written = lib.vt_detok_scores(
        buf.ctypes.data_as(U8P),
        starts.ctypes.data_as(I64P),
        ends.ctypes.data_as(I64P),
        n,
        boundaries.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        Lm1,
        cps16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        lengths.ctypes.data_as(I32P),
        scores.ctypes.data_as(I32P),
        out.ctypes.data_as(U8P),
        cap,
        n_threads,
    )
    if written < 0:
        return None
    return out[:written].tobytes()


def detok_native(
    blob: np.ndarray,  # uint8 ORIGINAL UTF-8 bytes
    starts: np.ndarray,  # int64 (n_lines,)
    ends: np.ndarray,  # int64 (n_lines,)
    boundaries: np.ndarray,  # int8 (n_lines, L-1) predicted gap labels
    n_threads: int = 0,
    scratch: Optional[dict] = None,
):
    """Tokenized-text writer: spaces at boundaries + reference escaping.

    With ``scratch`` (a caller-held dict), the output buffer is reused
    across calls and a zero-copy ``memoryview`` is returned (valid until
    the next call with the same scratch) — the lean server's hot path,
    avoiding a ~13 MB allocation + copy per batch. Without it, a fresh
    ``bytes`` is returned.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(starts)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    boundaries = np.ascontiguousarray(boundaries, dtype=np.int8)
    Lm1 = boundaries.shape[1] if boundaries.ndim == 2 else 0
    total = int((ends - starts).sum())
    cap = 2 * total + n * (Lm1 + 1) + 1
    if scratch is not None:
        out = scratch.get("detok")
        if out is None or out.size < cap:
            out = np.empty(int(cap * 5 // 4) + 16, dtype=np.uint8)
            scratch["detok"] = out
    else:
        out = np.empty(cap, dtype=np.uint8)
    buf = blob if blob.size else np.zeros(1, dtype=np.uint8)
    I64P = ctypes.POINTER(ctypes.c_int64)
    written = lib.vt_detok(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        starts.ctypes.data_as(I64P),
        ends.ctypes.data_as(I64P),
        n,
        boundaries.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        Lm1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap,
        n_threads,
    )
    if written < 0:
        return None
    if scratch is not None:
        return memoryview(out)[:written]
    return out[:written].tobytes()


def detok_bits_native(
    blob: np.ndarray,  # uint8 ORIGINAL UTF-8 bytes
    starts: np.ndarray,  # int64 (n_lines,)
    ends: np.ndarray,  # int64 (n_lines,)
    bits: np.ndarray,  # uint8 (B, bytes_per_row) little-endian gap bits
    max_gaps: int,  # gaps per line upper bound (line chars - 1)
    rows_of: Optional[np.ndarray] = None,  # int32 per-line packed row
    cols_of: Optional[np.ndarray] = None,  # int32 per-line packed column
    n_threads: int = 0,
    scratch: Optional[dict] = None,
):
    """Bit-packed tokenized-text writer (see native vt_detok_bits):
    consumes the device's 8-gaps-per-byte boundary readback directly,
    with optional per-line (row, col) placement for the short-line
    packing layout. Returns bytes/memoryview like :func:`detok_native`,
    or None when unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "vt_detok_bits"):
        return None
    n = len(starts)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    total = int((ends - starts).sum())
    cap = 2 * total + n * (max_gaps + 1) + 1
    if scratch is not None:
        out = scratch.get("detok")
        if out is None or out.size < cap:
            out = np.empty(int(cap * 5 // 4) + 16, dtype=np.uint8)
            scratch["detok"] = out
    else:
        out = np.empty(cap, dtype=np.uint8)
    buf = blob if blob.size else np.zeros(1, dtype=np.uint8)
    I64P = ctypes.POINTER(ctypes.c_int64)
    I32P = ctypes.POINTER(ctypes.c_int32)
    if rows_of is not None:
        rows_of = np.ascontiguousarray(rows_of, dtype=np.int32)
        cols_of = np.ascontiguousarray(cols_of, dtype=np.int32)
    written = lib.vt_detok_bits(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        starts.ctypes.data_as(I64P),
        ends.ctypes.data_as(I64P),
        n,
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        bits.shape[1] if bits.ndim == 2 else 0,
        rows_of.ctypes.data_as(I32P) if rows_of is not None else None,
        cols_of.ctypes.data_as(I32P) if cols_of is not None else None,
        max_gaps,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap,
        n_threads,
    )
    if written < 0:
        return None
    if scratch is not None:
        return memoryview(out)[:written]
    return out[:written].tobytes()


class TagScoresPlan:
    """Host emission plan for the native ``--tag-scores`` block
    (vt_detok_tags2): per token id, ALL slots in order, each with its
    UNESCAPED candidate pool range, candidate count, and score-column
    offset into the class-concatenated tag score row (the reference's
    print_tag_scores, predict/src/main.rs:76-91; column layout
    model.rs:17-38 — only multi-candidate slots own columns)."""

    def __init__(self, tag_meta):
        pool: list = []
        pool_off = [0]

        def add_pool(b: bytes) -> int:
            pool.append(b)
            pool_off.append(pool_off[-1] + len(b))
            return len(pool) - 1

        n_tokens = len(tag_meta.tags)
        ts_start = np.zeros(n_tokens + 1, dtype=np.int64)
        base: list = []
        cnt: list = []
        koff: list = []
        self.max_bytes = 0
        for tid, slots in enumerate(tag_meta.tags):
            k = 0
            tok_bytes = 0
            for cands in slots:
                first = len(pool)
                for c in cands:
                    add_pool(c.encode("utf-8"))
                base.append(first)
                cnt.append(len(cands))
                koff.append(k)
                if len(cands) == 1:
                    tok_bytes += 1 + (pool_off[-1] - pool_off[first]) + 2
                else:
                    k += len(cands)
                    tok_bytes += 1 + sum(
                        (pool_off[first + j + 1] - pool_off[first + j])
                        + 13
                        for j in range(len(cands))
                    )
            ts_start[tid + 1] = len(base)
            self.max_bytes = max(self.max_bytes, tok_bytes)
        self.start = ts_start
        self.base = np.asarray(base or [0], dtype=np.int32)
        self.cnt = np.asarray(cnt or [0], dtype=np.int32)
        self.koff = np.asarray(koff or [0], dtype=np.int32)
        self.pool = np.frombuffer(
            b"".join(pool) or b"\x00", dtype=np.uint8
        )
        self.pool_off = np.asarray(pool_off, dtype=np.int64)


def detok_tags2_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "vt_detok_tags2")


def detok_scores2_native(
    blob: np.ndarray,  # uint8 ORIGINAL UTF-8 bytes
    starts: np.ndarray,  # int64 (n_lines,)
    ends: np.ndarray,  # int64 (n_lines,)
    bits: np.ndarray,  # uint8 (B, bytes_per_row) gap bits
    counts: np.ndarray,  # int32 per-line char counts
    cps16: np.ndarray,  # uint16 (B, L) normalized device rows
    scores: np.ndarray,  # int32 (B, Lm1) raw gap scores
    rows_of: Optional[np.ndarray] = None,
    cols_of: Optional[np.ndarray] = None,
    n_threads: int = 0,
) -> Optional[bytes]:
    """Placement-aware ``--scores`` writer (native vt_detok_scores2):
    tokenized line + per-gap score block per line, reading boundaries
    as bit rows and codepoints/scores at per-line (row, col) placement
    (the packed short-line layout; NULL placement = line i at row i)."""
    lib = _load()
    if lib is None or not hasattr(lib, "vt_detok_scores2"):
        return None
    n = len(starts)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    counts = np.ascontiguousarray(counts, dtype=np.int32)
    cps16 = np.ascontiguousarray(cps16, dtype=np.uint16)
    scores = np.ascontiguousarray(scores, dtype=np.int32)
    total = int((ends - starts).sum())
    N = int(counts.sum())
    cap = 2 * total + N * 31 + n * 4 + 64
    out = np.empty(cap, dtype=np.uint8)
    buf = blob if blob.size else np.zeros(1, dtype=np.uint8)
    U8P = ctypes.POINTER(ctypes.c_uint8)
    I32P = ctypes.POINTER(ctypes.c_int32)
    I64P = ctypes.POINTER(ctypes.c_int64)
    U16P = ctypes.POINTER(ctypes.c_uint16)
    if rows_of is not None:
        rows_of = np.ascontiguousarray(rows_of, dtype=np.int32)
        cols_of = np.ascontiguousarray(cols_of, dtype=np.int32)
    written = lib.vt_detok_scores2(
        buf.ctypes.data_as(U8P),
        starts.ctypes.data_as(I64P),
        ends.ctypes.data_as(I64P),
        n,
        bits.ctypes.data_as(U8P),
        bits.shape[1] if bits.ndim == 2 else 0,
        rows_of.ctypes.data_as(I32P) if rows_of is not None else None,
        cols_of.ctypes.data_as(I32P) if cols_of is not None else None,
        counts.ctypes.data_as(I32P),
        cps16.ctypes.data_as(U16P),
        cps16.shape[1],
        scores.ctypes.data_as(I32P),
        scores.shape[1],
        out.ctypes.data_as(U8P),
        cap,
        n_threads,
    )
    if written < 0:
        return None
    return out[:written].tobytes()


def detok_tags2_native(
    blob: np.ndarray,  # uint8 ORIGINAL UTF-8 bytes
    starts: np.ndarray,  # int64 (n_lines,)
    ends: np.ndarray,  # int64 (n_lines,)
    bits: np.ndarray,  # uint8 (B, bytes_per_row) gap bits
    counts: np.ndarray,  # int32 per-line char counts
    tid: np.ndarray,  # (B, L) int32/int16/int8 token ids
    choice: np.ndarray,  # int8 (B, L, n_slots)
    plan: TagEmitPlan,
    rows_of: Optional[np.ndarray] = None,
    cols_of: Optional[np.ndarray] = None,
    cps16: Optional[np.ndarray] = None,  # needed for either block
    gap_scores: Optional[np.ndarray] = None,  # int32 (B, Lm1)
    tag_scores: Optional[np.ndarray] = None,  # int32 (B, L, C)
    ts_plan: Optional["TagScoresPlan"] = None,
    n_threads: int = 0,
) -> Optional[bytes]:
    """Tag-aware tokenized writer v2 (native vt_detok_tags2): bit-packed
    boundaries, per-line placement, narrow tid dtypes, and the optional
    native ``--scores`` / ``--tag-scores`` diagnostic blocks."""
    lib = _load()
    if lib is None or not hasattr(lib, "vt_detok_tags2"):
        return None
    n = len(starts)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    counts = np.ascontiguousarray(counts, dtype=np.int32)
    tid = np.ascontiguousarray(tid)
    kind = {np.dtype(np.int32): 0, np.dtype(np.int16): 1,
            np.dtype(np.int8): 2}.get(tid.dtype)
    if kind is None:
        tid = np.ascontiguousarray(tid, dtype=np.int32)
        kind = 0
    choice = np.ascontiguousarray(choice, dtype=np.int8)
    total = int((ends - starts).sum())
    N = int(counts.sum())
    per_char = 1 + plan.max_tag_bytes
    extra = 2
    if gap_scores is not None:
        per_char += 30
        extra += 2
    if tag_scores is not None:
        if ts_plan is None:
            raise ValueError("tag_scores needs a TagScoresPlan")
        per_char += 4 + ts_plan.max_bytes + 1
        extra += 2
    cap = 2 * total + N * per_char + n * extra + plan.max_tag_bytes + 64
    out = np.empty(cap, dtype=np.uint8)
    buf = blob if blob.size else np.zeros(1, dtype=np.uint8)
    U8P = ctypes.POINTER(ctypes.c_uint8)
    I8P = ctypes.POINTER(ctypes.c_int8)
    I32P = ctypes.POINTER(ctypes.c_int32)
    I64P = ctypes.POINTER(ctypes.c_int64)
    U16P = ctypes.POINTER(ctypes.c_uint16)
    if rows_of is not None:
        rows_of = np.ascontiguousarray(rows_of, dtype=np.int32)
        cols_of = np.ascontiguousarray(cols_of, dtype=np.int32)
    if cps16 is not None:
        cps16 = np.ascontiguousarray(cps16, dtype=np.uint16)
    if gap_scores is not None:
        gap_scores = np.ascontiguousarray(gap_scores, dtype=np.int32)
    if tag_scores is not None:
        tag_scores = np.ascontiguousarray(tag_scores, dtype=np.int32)
    written = lib.vt_detok_tags2(
        buf.ctypes.data_as(U8P),
        starts.ctypes.data_as(I64P),
        ends.ctypes.data_as(I64P),
        n,
        bits.ctypes.data_as(U8P),
        bits.shape[1] if bits.ndim == 2 else 0,
        rows_of.ctypes.data_as(I32P) if rows_of is not None else None,
        cols_of.ctypes.data_as(I32P) if cols_of is not None else None,
        counts.ctypes.data_as(I32P),
        tid.ctypes.data_as(ctypes.c_void_p),
        kind,
        tid.shape[1],
        choice.ctypes.data_as(I8P),
        choice.shape[2],
        plan.ent_start.ctypes.data_as(I64P),
        plan.ent_base.ctypes.data_as(I32P),
        plan.ent_ccol.ctypes.data_as(I32P),
        plan.pool.ctypes.data_as(U8P),
        plan.pool_off.ctypes.data_as(I64P),
        plan.max_tag_bytes,
        cps16.ctypes.data_as(U16P) if cps16 is not None else None,
        (gap_scores.ctypes.data_as(I32P)
         if gap_scores is not None else None),
        gap_scores.shape[1] if gap_scores is not None else 0,
        (tag_scores.ctypes.data_as(I32P)
         if tag_scores is not None else None),
        tag_scores.shape[2] if tag_scores is not None else 0,
        (ts_plan.start.ctypes.data_as(I64P)
         if ts_plan is not None else None),
        ts_plan.base.ctypes.data_as(I32P) if ts_plan is not None else None,
        ts_plan.cnt.ctypes.data_as(I32P) if ts_plan is not None else None,
        ts_plan.koff.ctypes.data_as(I32P) if ts_plan is not None else None,
        ts_plan.pool.ctypes.data_as(U8P) if ts_plan is not None else None,
        (ts_plan.pool_off.ctypes.data_as(I64P)
         if ts_plan is not None else None),
        ts_plan.max_bytes if ts_plan is not None else 0,
        out.ctypes.data_as(U8P),
        cap,
        n_threads,
    )
    if written < 0:
        return None
    return out[:written].tobytes()


def abi_version() -> int:
    """Native library ABI version (0 = pre-round-5 library without the
    marker; >= 5 = vt_tensorize16* carry the types output)."""
    lib = _load()
    if lib is None or not hasattr(lib, "vt_abi_version"):
        return 0
    return int(lib.vt_abi_version())
