"""ctypes bindings for the C++ host runtime (genmmrec_native.cpp).

Auto-builds the shared library with g++ on first import (cached next to the
source); every entry point has a pure-numpy fallback so the framework works
without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "genmmrec_native.cpp")
_LIB = os.path.join(_DIR, "libgenmmrec_native.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    c = ctypes
    lib.tsv_count_rows.restype = c.c_int64
    lib.tsv_count_rows.argtypes = [c.c_char_p]
    lib.tsv_parse_inter.restype = c.c_int64
    lib.tsv_parse_inter.argtypes = [
        c.c_char_p, c.c_int, c.c_int, c.c_int, c.c_int,
        i32p, i32p, i32p, c.c_void_p, c.c_int64,
    ]
    lib.build_padded_history.restype = c.c_int64
    lib.build_padded_history.argtypes = [
        i32p, i32p, c.c_int64, c.c_int32, c.c_int32, i32p, i32p, c.c_int64,
    ]
    lib.max_row_count.restype = c.c_int64
    lib.max_row_count.argtypes = [i32p, c.c_int64, c.c_int32]
    lib.cooccur_topk.restype = None
    lib.cooccur_topk.argtypes = [
        i32p, i32p, c.c_int64, c.c_int32, c.c_int32, c.c_int32, i32p, f32p,
    ]
    _lib = lib
    return _lib


# ----------------------------------------------------------------------
def parse_inter_tsv(
    path: str, header: list, uid_field: str, iid_field: str,
    label_field: str, rating_field: Optional[str] = None,
):
    """Native TSV parse. Returns (users, items, labels, ratings|None) or
    None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = lib.tsv_count_rows(path.encode())
    if n < 0:
        return None
    cols = {name: i for i, name in enumerate(header)}
    if uid_field not in cols or iid_field not in cols or label_field not in cols:
        return None
    r_col = cols.get(rating_field, -1) if rating_field else -1
    users = np.empty(n, np.int32)
    items = np.empty(n, np.int32)
    labels = np.empty(n, np.int32)
    ratings = np.empty(n, np.float32) if r_col >= 0 else None
    got = lib.tsv_parse_inter(
        path.encode(), cols[uid_field], cols[iid_field], cols[label_field],
        r_col,
        users, items, labels,
        ratings.ctypes.data_as(ctypes.c_void_p) if ratings is not None else None,
        n,
    )
    if got < 0:
        return None
    return users[:got], items[:got], labels[:got], (
        ratings[:got] if ratings is not None else None
    )


def padded_history(ids: np.ndarray, vals: np.ndarray, n_rows: int, pad_value: int):
    """Native padded+sorted history build; None on unavailability."""
    lib = get_lib()
    if lib is None:
        return None
    ids = np.ascontiguousarray(ids, np.int32)
    vals = np.ascontiguousarray(vals, np.int32)
    max_len = max(1, int(lib.max_row_count(ids, len(ids), n_rows)))
    out = np.empty((n_rows, max_len), np.int32)
    lens = np.empty(n_rows, np.int32)
    lib.build_padded_history(ids, vals, len(ids), n_rows, pad_value, out, lens, max_len)
    return out, lens


def cooccur_topk(
    left: np.ndarray, right: np.ndarray, n_left: int, n_right: int, k: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native co-occurrence top-k; None on unavailability."""
    lib = get_lib()
    if lib is None:
        return None
    left = np.ascontiguousarray(left, np.int32)
    right = np.ascontiguousarray(right, np.int32)
    nbrs = np.zeros((n_left, k), np.int32)
    wts = np.zeros((n_left, k), np.float32)
    lib.cooccur_topk(left, right, len(left), n_left, n_right, k, nbrs, wts)
    return nbrs, wts
