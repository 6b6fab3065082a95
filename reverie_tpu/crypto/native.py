"""ctypes bindings to the native crypto library (libreverie_native.so).

Builds the library on first use if the shared object is missing or stale.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libreverie_native.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    subprocess.run(
        ["make", "-s", "-C", _NATIVE_DIR],
        check=True,
        capture_output=True,
    )


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        srcs = [
            os.path.join(_NATIVE_DIR, f)
            for f in os.listdir(_NATIVE_DIR)
            if f.endswith(".c")
        ]
        if not os.path.exists(_LIB_PATH) or any(
            os.path.getmtime(s) > os.path.getmtime(_LIB_PATH) for s in srcs
        ):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)

        lib.aes128_ctr_keystream.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        lib.aes128_ctr_keystream_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_size_t,
        ]
        lib.aes128_encrypt_block.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_void_p]
        lib.aes128_key_expand.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
        lib.aes128_key_expand_batch.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
        lib.blake3_hash.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p]
        lib.blake3_xof.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        lib.blake3_hash_many.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_size_t,
            ctypes.c_void_p,
        ]
        _lib = lib
        return _lib
