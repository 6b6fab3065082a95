"""Direct differential tests for the device blake3 column hasher
(crypto/kernels/blake3_jax.py) vs the independent pure-Python blake3
(crypto/blake3_py.py).  Covers the compress_words hot path (bulk chunk CVs
under lax.scan), the row-tensor cold paths (tail chunks, tree reduce), and
the incremental ColumnHasher used by the streaming prover.

Reference analog: crypto/hash.rs:28-104 (sequential host hashing of the
transcript streams)."""

import numpy as np
import jax.numpy as jnp
import pytest

from reverie_tpu.crypto.blake3_py import blake3_py
from reverie_tpu.crypto.kernels.blake3_jax import ColumnHasher, hash_columns, hash_pair_columns


def _cols(T: int, R: int, seed: int = 0) -> np.ndarray:
    return np.random.RandomState(seed).randint(0, 256, size=(max(T, 1), R), dtype=np.uint8)


@pytest.mark.parametrize(
    "T",
    [
        1,       # sub-block
        64,      # one block
        65,      # block + 1
        1024,    # exactly one chunk
        1025,    # chunk + 1 byte (2 chunks, tiny tail -> root parent)
        2048,    # two full chunks
        4096,    # four chunks (tree level)
        5000,    # five chunks, partial tail (odd-last promotion)
        16384,   # 16 chunks -- the bulk compress_words path end-to-end
        16385,
    ],
)
def test_hash_columns_matches_python(T):
    R = 4
    buf = _cols(T, R, seed=T)
    out = np.asarray(hash_columns(jnp.asarray(buf), T))
    assert out.shape == (R, 32)
    for r in range(R):
        assert out[r].tobytes() == blake3_py(buf[:T, r].tobytes()), f"T={T} col {r}"


def test_hash_columns_empty():
    out = np.asarray(hash_columns(jnp.zeros((1, 3), jnp.uint8), 0))
    want = blake3_py(b"")
    for r in range(3):
        assert out[r].tobytes() == want


@pytest.mark.parametrize("splits", [[1000, 3000, 1192], [5192], [1, 1023, 4168], [2048, 2048, 1096]])
def test_column_hasher_incremental_matches_oneshot(splits):
    T, R = sum(splits), 3
    buf = _cols(T, R, seed=99)
    h = ColumnHasher(T, R)
    off = 0
    for L in splits:
        h.absorb(jnp.asarray(buf[off : off + L]))
        off += L
    out = np.asarray(h.finalize())
    for r in range(R):
        assert out[r].tobytes() == blake3_py(buf[:, r].tobytes())


def test_hash_pair_columns_matches_python():
    R = 5
    a = _cols(32, R, seed=1).T.copy()  # (R, 32)
    b = _cols(32, R, seed=2).T.copy()
    out = np.asarray(hash_pair_columns(jnp.asarray(a), jnp.asarray(b)))
    for r in range(R):
        assert out[r].tobytes() == blake3_py(a[r].tobytes() + b[r].tobytes())
