"""ctypes binding for the native GGUF kernels (native/gguf_kernels.cpp).

Builds on demand with the system compiler (g++ -O3 -fopenmp); all callers
fall back to the numpy implementations when the library is unavailable, so
the native path is a pure accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..utils.logging import SRV_INF, SRV_WRN

_lock = threading.Lock()
_lib = None
_tried = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRCS = [os.path.join(_NATIVE_DIR, "gguf_kernels.cpp"),
         os.path.join(_NATIVE_DIR, "tokenizer_core.cpp"),
         os.path.join(_NATIVE_DIR, "grammar_core.cpp")]
_OUT = os.path.join(_NATIVE_DIR, "libgguf_kernels.so")


def _build() -> str | None:
    srcs = [os.path.abspath(s) for s in _SRCS if os.path.exists(s)]
    out = os.path.abspath(_OUT)
    if not srcs:
        return None
    if os.path.exists(out) and all(
            os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs):
        return out
    last = None
    for cxx in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cxx, "-O3", "-fopenmp", "-shared", "-fPIC", *srcs,
                 "-o", out],
                check=True, capture_output=True, timeout=180)
            SRV_INF("native", "built %s with %s", out, cxx)
            return out
        except (FileNotFoundError, subprocess.CalledProcessError,
                subprocess.TimeoutExpired) as exc:
            last = exc
            continue
    SRV_WRN("native", "native kernel build failed (%r); using numpy", last)
    return None


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("LLAMA_BOX_TPU_NO_NATIVE"):
            return None
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError as exc:
            SRV_WRN("native", "dlopen failed: %r", exc)
            return None
        lib.lbox_repack.restype = ctypes.c_int
        lib.lbox_repack.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.lbox_dequant.restype = ctypes.c_int
        lib.lbox_dequant.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.lbox_group_size.restype = ctypes.c_int
        lib.lbox_group_size.argtypes = [ctypes.c_int]
        lib.lbox_qbits.restype = ctypes.c_int
        lib.lbox_qbits.argtypes = [ctypes.c_int]
        lib.lbox_spm_new.restype = ctypes.c_void_p
        lib.lbox_spm_new.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int32]
        lib.lbox_spm_free.argtypes = [ctypes.c_void_p]
        lib.lbox_spm_encode.restype = ctypes.c_int64
        lib.lbox_spm_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64]
        lib.lbox_bpe_new.restype = ctypes.c_void_p
        lib.lbox_bpe_new.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_char_p,
            ctypes.c_void_p, ctypes.c_int64]
        lib.lbox_bpe_free.argtypes = [ctypes.c_void_p]
        lib.lbox_bpe_encode.restype = ctypes.c_int64
        lib.lbox_bpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64]
        _lib = lib
        return _lib


def _as_bytes_ptr(raw) -> tuple[ctypes.c_void_p, int]:
    arr = np.frombuffer(raw, dtype=np.uint8) if not isinstance(raw, np.ndarray) \
        else raw.reshape(-1).view(np.uint8)
    return arr.ctypes.data_as(ctypes.c_void_p), arr

def native_dequant(ggml_type: int, raw, n: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(n, np.float32)
    ptr, keep = _as_bytes_ptr(raw)
    rc = lib.lbox_dequant(int(ggml_type), ptr, n,
                          out.ctypes.data_as(ctypes.c_void_p))
    return out if rc == 0 else None


def native_repack(ggml_type: int, raw, n: int):
    """Returns (q int8[n], scales f32[n/group], mins f32[n/group]|None,
    group, qbits) or None."""
    lib = get_lib()
    if lib is None:
        return None
    group = lib.lbox_group_size(int(ggml_type))
    qbits = lib.lbox_qbits(int(ggml_type))
    if group <= 0:
        return None
    q = np.empty(n, np.int8)
    scales = np.empty(n // group, np.float32)
    # formats without mins still fill zeros; detect via repack.py table
    mins = np.empty(n // group, np.float32)
    ptr, keep = _as_bytes_ptr(raw)
    rc = lib.lbox_repack(int(ggml_type), ptr, n,
                         q.ctypes.data_as(ctypes.c_void_p),
                         scales.ctypes.data_as(ctypes.c_void_p),
                         mins.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return None
    if not mins.any():
        mins = None
    return q, scales, mins, group, qbits
