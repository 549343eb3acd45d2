"""Native (C) host kernel loader.

Builds/loads `native/libzk_native.so` via ctypes (the image has no pybind11;
ctypes is the supported binding path). Currently: Keccak-256 (original
padding) single + batched. Falls back transparently to the pure-python
implementations when the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO = os.path.join(_NATIVE_DIR, "libzk_native.so")
_SRC = os.path.join(_NATIVE_DIR, "zk_native.c")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and os.path.exists(_SRC):
        try:
            subprocess.run(["cc", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                           check=True, capture_output=True)
        except Exception:
            _lib = False
            return False
    try:
        lib = ctypes.CDLL(_SO)
        lib.zk_keccak_256.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                      ctypes.c_char_p]
        lib.zk_keccak_256_batch.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                            ctypes.c_uint64, ctypes.c_char_p]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def keccak_256_native(data: bytes):
    lib = _load()
    if not lib:
        return None
    out = ctypes.create_string_buffer(32)
    lib.zk_keccak_256(data, len(data), out)
    return out.raw


def keccak_256_batch_native(messages: list[bytes]):
    """All messages must share one length."""
    lib = _load()
    if not lib or not messages:
        return None
    mlen = len(messages[0])
    if any(len(m) != mlen for m in messages):
        return None
    blob = b"".join(messages)
    out = ctypes.create_string_buffer(32 * len(messages))
    lib.zk_keccak_256_batch(blob, mlen, len(messages), out)
    return [out.raw[i * 32:(i + 1) * 32] for i in range(len(messages))]


def available() -> bool:
    return bool(_load())
