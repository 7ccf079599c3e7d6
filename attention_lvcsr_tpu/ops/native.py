"""ctypes bindings for the native host kernels (native/lvsr_native.cpp).

Loads ``native/liblvsr_native.so`` (building it with ``make`` on first use
if the toolchain is available); every entry point has a numpy fallback in
:mod:`attention_lvcsr_tpu.ops.error_rate`, so the framework works without
a compiler — the native path is a speedup, not a dependency.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblvsr_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build():
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        I64 = ctypes.POINTER(ctypes.c_int64)
        lib.lvsr_edit_distances.argtypes = [I64, I64, I64, I64,
                                            ctypes.c_int64, ctypes.c_int64,
                                            ctypes.c_int64, I64]
        lib.lvsr_batch_reward_gain.argtypes = [
            I64, I64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, I64, I64]
        _lib = lib
        return _lib


def _i64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def available() -> bool:
    return get_lib() is not None


def batch_reward_and_gain_native(groundtruth, recognized, alphabet_size,
                                 eos_label):
    """Native batched rewards/gains ((T,B) -> (T,B,A) each), or None."""
    lib = get_lib()
    if lib is None:
        return None
    gt = np.ascontiguousarray(groundtruth, np.int64)
    rec = np.ascontiguousarray(recognized, np.int64)
    T_g, B = gt.shape
    T_r, B2 = rec.shape
    if B != B2:
        raise ValueError("batch mismatch")
    rewards = np.empty((T_r, B, alphabet_size), np.int64)
    gains = np.empty((T_r, B, alphabet_size), np.int64)
    lib.lvsr_batch_reward_gain(_i64(gt), _i64(rec), T_g, T_r, B,
                               alphabet_size, eos_label, _i64(rewards),
                               _i64(gains))
    return rewards, gains


def edit_distances_native(a_seqs, b_seqs):
    """Batched edit distance over two lists of int sequences, or None."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(a_seqs)
    max_a = max((len(s) for s in a_seqs), default=0)
    max_b = max((len(s) for s in b_seqs), default=0)
    a = np.zeros((n, max(max_a, 1)), np.int64)
    b = np.zeros((n, max(max_b, 1)), np.int64)
    a_lens = np.asarray([len(s) for s in a_seqs], np.int64)
    b_lens = np.asarray([len(s) for s in b_seqs], np.int64)
    for i, s in enumerate(a_seqs):
        a[i, :len(s)] = s
    for i, s in enumerate(b_seqs):
        b[i, :len(s)] = s
    out = np.empty((n,), np.int64)
    lib.lvsr_edit_distances(_i64(a), _i64(a_lens), _i64(b), _i64(b_lens),
                            n, a.shape[1], b.shape[1], _i64(out))
    return out
