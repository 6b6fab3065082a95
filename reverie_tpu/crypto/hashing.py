"""blake3 hashing + the Fiat-Shamir random oracle.

Counterparts of the reference's hash wrappers (src/crypto/hash.rs) and
`RandomOracle` (src/crypto/ro.rs:3-21).  Note the reference's BufferedHasher
only buffers bytes before feeding blake3 -- it does not change the digest --
so one-shot hashing of the accumulated transcript byte stream is exactly
equivalent.
"""

from __future__ import annotations

import numpy as np

from .native import get_lib

HASH_SIZE = 32


def blake3(data: bytes) -> bytes:
    out = np.empty(HASH_SIZE, dtype=np.uint8)
    buf = np.frombuffer(data, dtype=np.uint8) if data else np.empty(0, dtype=np.uint8)
    get_lib().blake3_hash(buf.ctypes.data if len(buf) else None, len(buf), out.ctypes.data)
    return out.tobytes()


def blake3_xof(data: bytes, outlen: int) -> bytes:
    out = np.empty(outlen, dtype=np.uint8)
    buf = np.frombuffer(data, dtype=np.uint8) if data else np.empty(0, dtype=np.uint8)
    get_lib().blake3_xof(buf.ctypes.data if len(buf) else None, len(buf), out.ctypes.data, outlen)
    return out.tobytes()


def blake3_many(data: np.ndarray) -> np.ndarray:
    """Hash n equal-length rows: (n, length) uint8 -> (n, 32) uint8."""
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n, length = data.shape
    out = np.empty((n, HASH_SIZE), dtype=np.uint8)
    get_lib().blake3_hash_many(data.ctypes.data, n, length, out.ctypes.data)
    return out


def hash_pair(a: bytes, b: bytes) -> bytes:
    """H(a || b) -- the per-rep H(preprocess_hash || online_hash) join
    (reference transcript/mod.rs:77-96) and gf2/z64 join (combine.rs:104-118)."""
    return blake3(a + b)


def combine_hashes(hashes) -> bytes:
    """H(h_0 || h_1 || ...) (reference proof/mod.rs:102-108)."""
    return blake3(b"".join(hashes))


class RandomOracle:
    """blake3 XOF seeded with `blake3(ctx || 0x00 || input)` keyed stream
    (reference crypto/ro.rs:8-20).  `fill` draws successive bytes."""

    def __init__(self, ctx: str, data: bytes):
        self._input = ctx.encode() + b"\x00" + data
        self._consumed = 0

    def fill(self, n: int) -> bytes:
        # Re-derive the stream prefix each call; draws are tiny (16B each).
        end = self._consumed + n
        stream = blake3_xof(self._input, end)
        out = stream[self._consumed : end]
        self._consumed = end
        return out
