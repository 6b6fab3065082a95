"""Pallas TPU kernel: BLAKE3 full-chunk CVs (the transcript-hash hot loop).

The XLA version (blake3_jax._chunk_cvs) keeps the 4x4 state as (4, ...) row
tensors and mixes diagonals via jnp.roll -- every roll is a sublane relayout
on TPU.  This kernel holds the 16 state words as 16 independent (TC, R)
registers, so the 7 rounds are pure VPU add/xor/rotate with zero relayouts
(reference hashes these same streams byte-serially on the host,
crypto/hash.rs:28-104).

Scope: *bulk* full chunks only (16 blocks x 64 B, non-root).  The final
chunk / tree reduction stays in XLA (negligible bytes).  Layout in:
(16, n_chunks, 16, R) u32 message words, block-major so the 16-block chunk
scan is a leading-axis dynamic ref read; out: (n_chunks, 8, R) u32 CVs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32

IV = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
     0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
    dtype=np.uint32,
)
MSG_PERM = np.array([2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8])
CHUNK_START, CHUNK_END = 1, 2

# per-round message word index schedule (standard BLAKE3 sigma iteration)
_SIGMA = []
_perm = np.arange(16)
for _ in range(7):
    _SIGMA.append(_perm.copy())
    _perm = _perm[MSG_PERM]


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


def _chunk_kernel(tc: int, base_ref, words_ref, out_ref):
    """words_ref: (16, TC, 16, R); out_ref: (TC, 8, R); base_ref: (1,) SMEM
    global chunk counter base for this call."""
    TC = tc
    R = out_ref.shape[-1]
    ctr = (
        base_ref[0].astype(U32)
        + (pl.program_id(0) * TC).astype(U32)
        + jax.lax.broadcasted_iota(U32, (TC, R), 0)
    )
    zeros = jnp.zeros((TC, R), U32)
    cv = tuple(jnp.full((TC, R), IV[i], U32) for i in range(8))

    def block_body(blk, cv):
        m_all = words_ref[blk]  # (TC, 16, R)
        m = [m_all[:, w, :] for w in range(16)]
        flags = jnp.where(blk == 0, np.uint32(CHUNK_START), np.uint32(0)) | (
            jnp.where(blk == 15, np.uint32(CHUNK_END), np.uint32(0))
        )
        v = [
            cv[0], cv[1], cv[2], cv[3], cv[4], cv[5], cv[6], cv[7],
            jnp.full((TC, R), IV[0], U32), jnp.full((TC, R), IV[1], U32),
            jnp.full((TC, R), IV[2], U32), jnp.full((TC, R), IV[3], U32),
            ctr, zeros, jnp.full((TC, R), np.uint32(64), U32),
            jnp.broadcast_to(flags.astype(U32), (TC, R)),
        ]
        for rnd in range(7):
            s = _SIGMA[rnd]
            _g(v, 0, 4, 8, 12, m[s[0]], m[s[1]])
            _g(v, 1, 5, 9, 13, m[s[2]], m[s[3]])
            _g(v, 2, 6, 10, 14, m[s[4]], m[s[5]])
            _g(v, 3, 7, 11, 15, m[s[6]], m[s[7]])
            _g(v, 0, 5, 10, 15, m[s[8]], m[s[9]])
            _g(v, 1, 6, 11, 12, m[s[10]], m[s[11]])
            _g(v, 2, 7, 8, 13, m[s[12]], m[s[13]])
            _g(v, 3, 4, 9, 14, m[s[14]], m[s[15]])
        return tuple(v[i] ^ v[i + 8] for i in range(8))

    cv = jax.lax.fori_loop(0, 16, block_body, cv)
    for i in range(8):
        out_ref[:, i, :] = cv[i]


def chunk_cvs_pallas(words, chunk_base, tile_c: int = 8,
                     interpret: bool = False):
    """words: (n_chunks, 16, 16, R) u32 full-chunk message words;
    chunk_base: i32 scalar (traced ok) global counter of chunk 0.
    Returns (r0, r1) each (4, n_chunks, R) -- drop-in for the bulk
    _chunk_cvs call in blake3_jax."""
    n, _, _, R = words.shape
    tc = min(tile_c, max(n, 1))
    npad = ((n + tc - 1) // tc) * tc
    wb = jnp.moveaxis(words, 1, 0)  # (16, n, 16, R)
    if npad != n:
        wb = jnp.concatenate(
            [wb, jnp.zeros((16, npad - n, 16, R), U32)], axis=1
        )
    out = pl.pallas_call(
        functools.partial(_chunk_kernel, tc),
        out_shape=jax.ShapeDtypeStruct((npad, 8, R), U32),
        grid=(npad // tc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((16, tc, 16, R), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tc, 8, R), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(chunk_base, jnp.int32).reshape(1), wb)
    out = out[:n]  # (n, 8, R)
    r = jnp.moveaxis(out, 1, 0)  # (8, n, R)
    return r[:4], r[4:]
