"""Batched BLAKE3 on device (JAX/XLA, VPU-vectorized).

Hashes many equal-length byte streams at once: the transcript buffers are
(T, R) uint8 tensors whose columns are the per-repetition streams
(reference absorbs these sequentially into per-rep hashers,
crypto/hash.rs:28-104; here all R streams hash in parallel as vector lanes).

The compression function is 7 rounds x 8 G-mixes of u32 add/xor/rotate --
pure VPU work.  Blocks chain sequentially within a chunk (lax.scan); chunks
are independent (vectorized); the chunk tree reduces with the spec's
left-biased split (largest power of two strictly less than n).

Implementation note: the hash state is threaded as *tuples of arrays*, never
stacked -- `jnp.stack` on the deep compression graph sends XLA's fusion
planner into superlinear compile times (hours for a 16-block chunk).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32

IV = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
     0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
    dtype=np.uint32,
)
MSG_PERM = np.array([2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8])
CHUNK_START, CHUNK_END, PARENT, ROOT = 1, 2, 4, 8


def _rotr(x, n: int):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _g(v, a, b, c, d, mx, my):
    v[a] = v[a] + v[b] + mx
    v[d] = _rotr(v[d] ^ v[a], 16)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 12)
    v[a] = v[a] + v[b] + my
    v[d] = _rotr(v[d] ^ v[a], 8)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 7)


def compress(cv: Sequence, m: Sequence, counter_lo, counter_hi, block_len, flags,
             full: bool = False):
    """One vectorized compression on tuple state.

    cv: 8 arrays; m: 16 arrays (broadcast-compatible); counters/len/flags:
    scalars or arrays.  Returns tuple of 8 (or 16 when `full`) arrays.
    """
    shape = cv[0].shape
    bc = lambda x: jnp.broadcast_to(jnp.asarray(x, U32), shape).astype(U32)
    v = list(cv[:8])
    v += [bc(IV[0]), bc(IV[1]), bc(IV[2]), bc(IV[3]),
          bc(counter_lo), bc(counter_hi), bc(block_len), bc(flags)]
    msg = list(m)
    perm = np.arange(16)
    for _ in range(7):
        p = perm
        _g(v, 0, 4, 8, 12, msg[p[0]], msg[p[1]])
        _g(v, 1, 5, 9, 13, msg[p[2]], msg[p[3]])
        _g(v, 2, 6, 10, 14, msg[p[4]], msg[p[5]])
        _g(v, 3, 7, 11, 15, msg[p[6]], msg[p[7]])
        _g(v, 0, 5, 10, 15, msg[p[8]], msg[p[9]])
        _g(v, 1, 6, 11, 12, msg[p[10]], msg[p[11]])
        _g(v, 2, 7, 8, 13, msg[p[12]], msg[p[13]])
        _g(v, 3, 4, 9, 14, msg[p[14]], msg[p[15]])
        perm = perm[MSG_PERM]
    out = tuple(v[i] ^ v[i + 8] for i in range(8))
    if full:
        return out + tuple(v[i + 8] ^ cv[i] for i in range(8))
    return out


def _bytes_to_words(buf):
    """(T4*4, ...) uint8 -> (T4, ...) u32 little-endian."""
    T = buf.shape[0]
    b = buf.reshape(T // 4, 4, *buf.shape[1:]).astype(U32)
    return b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)


def _iv_state(shape) -> Tuple:
    return tuple(jnp.full(shape, int(IV[i]), U32) for i in range(8))


def _chunk_cvs(words, nblocks: int, block_lens: np.ndarray, counters: np.ndarray,
               last_flags_extra: int = 0):
    """words: (n_chunks, nblocks, 16, R) u32 -> tuple of 8 (n_chunks, R) CVs."""
    n_chunks, _, _, R = words.shape
    cv = _iv_state((n_chunks, R))
    ctr = jnp.asarray(counters, U32).reshape(n_chunks, 1)

    flags = np.zeros(nblocks, np.uint32)
    flags[0] |= CHUNK_START
    flags[-1] |= CHUNK_END | last_flags_extra

    # xs: 16 message-word arrays of (nblocks, n_chunks, R) + lens + flags
    ms = tuple(words[:, :, i, :].swapaxes(0, 1) for i in range(16))

    def body(cv, xs):
        blen, flg = xs[16], xs[17]
        out = compress(cv, xs[:16], ctr, jnp.zeros_like(ctr), blen, flg)
        return out, None

    cv, _ = jax.lax.scan(
        body, cv,
        ms + (jnp.asarray(block_lens, U32), jnp.asarray(flags, U32)),
    )
    return cv


def _tree_reduce(cvs, is_root: bool):
    """cvs: tuple of 8 (n, R) -> tuple of 8 (R,) root/subtree CV."""
    n = cvs[0].shape[0]
    if n == 1:
        assert not is_root  # single-chunk root handled in the chunk pass
        return tuple(c[0] for c in cvs)
    left = 1
    while left * 2 < n:
        left *= 2
    l = _tree_reduce(tuple(c[:left] for c in cvs), False)
    r = _tree_reduce(tuple(c[left:] for c in cvs), False)
    m = l + r  # 16 arrays
    cv = _iv_state(l[0].shape)
    return compress(cv, m, 0, 0, 64, PARENT | (ROOT if is_root else 0))


def hash_columns(buf, T: int):
    """buf: (>=T, R) uint8 (rows beyond T ignored); returns (R, 32) uint8
    per-column blake3 hashes.  T is static."""
    R = buf.shape[1]
    if T == 0:
        from ..blake3_py import blake3_py

        h = np.frombuffer(blake3_py(b""), dtype=np.uint8)
        return jnp.broadcast_to(jnp.asarray(h)[None, :], (R, 32))

    n_chunks = (T + 1023) // 1024
    padded = n_chunks * 1024
    buf = buf[:T]
    if padded != T:
        buf = jnp.concatenate([buf, jnp.zeros((padded - T, R), jnp.uint8)], axis=0)
    words = _bytes_to_words(buf).reshape(n_chunks, 16, 16, R)

    rem = T - (n_chunks - 1) * 1024
    nb_tail = max(1, (rem + 63) // 64)
    tail_lens = np.full(nb_tail, 64, np.uint32)
    tail_lens[nb_tail - 1] = rem - (nb_tail - 1) * 64

    if n_chunks == 1:
        out = _chunk_cvs(words[:, :nb_tail], nb_tail, tail_lens, np.array([0]),
                         last_flags_extra=ROOT)
        out = tuple(o[0] for o in out)  # (R,)
    else:
        full = _chunk_cvs(words[:-1], 16, np.full(16, 64, np.uint32),
                          np.arange(n_chunks - 1))
        tail = _chunk_cvs(words[-1:, :nb_tail], nb_tail, tail_lens,
                          np.array([n_chunks - 1]))
        cvs = tuple(jnp.concatenate([f, t], axis=0) for f, t in zip(full, tail))
        out = _tree_reduce(cvs, True)

    return _words_to_bytes(out)


def _words_to_bytes(w: Sequence):
    """8 arrays of (R,) u32 -> (R, 32) uint8 little-endian."""
    w = jax.lax.optimization_barrier(tuple(w))
    cols = []
    for i in range(8):
        for s in (0, 8, 16, 24):
            cols.append((w[i] >> np.uint32(s)).astype(jnp.uint8))
    return jnp.stack(cols, axis=-1)  # (R, 32)


def hash_pair_columns(a, b):
    """a, b: (R, 32) uint8 -> (R, 32) blake3(a || b) per row (single block)."""
    buf = jnp.concatenate([a, b], axis=1)  # (R, 64)
    m = _bytes_to_words(jnp.moveaxis(buf, 0, 1))  # (16, R)
    cv = _iv_state((a.shape[0],))
    out = compress(cv, tuple(m[i] for i in range(16)), 0, 0, 64,
                   CHUNK_START | CHUNK_END | ROOT)
    return _words_to_bytes(out)
