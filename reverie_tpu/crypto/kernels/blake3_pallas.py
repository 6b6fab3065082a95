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


def _chunk_kernel_v2(tc: int, base_ref, words_ref, out_ref):
    """words_ref: (16 blocks, 16 words, TC, RT) -- every message word is a
    contiguous (TC, RT) VMEM tile; out_ref: (8, TC, RT).

    v2 layout rationale (round 3): with RT=128 each state/message word is
    exactly one (8, 128) vreg at TC=8, so the 7 rounds run spill-free (the v1
    (TC, R=256) words were 2 vregs each -- 64 vregs of live state+message
    guaranteed spills, measured 12 GB/s vs the XLA path's 16)."""
    TC = tc
    RT = out_ref.shape[-1]
    ctr = (
        base_ref[0].astype(U32)
        + (pl.program_id(0) * TC).astype(U32)
        + jax.lax.broadcasted_iota(U32, (TC, RT), 0)
    )
    zeros = jnp.zeros((TC, RT), U32)
    blen = jnp.full((TC, RT), np.uint32(64), U32)
    cv = tuple(jnp.full((TC, RT), IV[i], U32) for i in range(8))
    for blk in range(16):
        m = [words_ref[blk, w] for w in range(16)]
        flags = np.uint32(
            (CHUNK_START if blk == 0 else 0) | (CHUNK_END if blk == 15 else 0)
        )
        v = [
            cv[0], cv[1], cv[2], cv[3], cv[4], cv[5], cv[6], cv[7],
            jnp.full((TC, RT), IV[0], U32), jnp.full((TC, RT), IV[1], U32),
            jnp.full((TC, RT), IV[2], U32), jnp.full((TC, RT), IV[3], U32),
            ctr, zeros, blen, jnp.full((TC, RT), flags, U32),
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
        cv = tuple(v[i] ^ v[i + 8] for i in range(8))
    for i in range(8):
        out_ref[i] = cv[i]


def _chunk_kernel_v3(tc: int, base_ref, words_ref, out_ref):
    """words_ref: (16 blocks, TC, 16 words, RT); out_ref: (8, TC, RT).

    v3 = v1's block-major host layout (a cheap moveaxis the byte->word pass
    fuses; the v2 (16,16,n,R) transpose cost ~1.1 s at the 1M shape) combined
    with v2's 128-lane tiling (RT=128 -> every state/message word is one
    (8, 128) vreg at TC=8; v1's (TC, 256) words were 2 vregs each = 64 live
    vregs and guaranteed spills).  The word slice words_ref[blk, :, w, :] is a
    sublane-strided VMEM read -- far cheaper than either the HBM transpose or
    the spills."""
    TC = tc
    RT = out_ref.shape[-1]
    ctr = (
        base_ref[0].astype(U32)
        + (pl.program_id(0) * TC).astype(U32)
        + jax.lax.broadcasted_iota(U32, (TC, RT), 0)
    )
    zeros = jnp.zeros((TC, RT), U32)
    blen = jnp.full((TC, RT), np.uint32(64), U32)
    cv = tuple(jnp.full((TC, RT), IV[i], U32) for i in range(8))
    for blk in range(16):
        m = [words_ref[blk, :, w, :] for w in range(16)]
        flags = np.uint32(
            (CHUNK_START if blk == 0 else 0) | (CHUNK_END if blk == 15 else 0)
        )
        v = [
            cv[0], cv[1], cv[2], cv[3], cv[4], cv[5], cv[6], cv[7],
            jnp.full((TC, RT), IV[0], U32), jnp.full((TC, RT), IV[1], U32),
            jnp.full((TC, RT), IV[2], U32), jnp.full((TC, RT), IV[3], U32),
            ctr, zeros, blen, jnp.full((TC, RT), flags, U32),
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
        cv = tuple(v[i] ^ v[i + 8] for i in range(8))
    for i in range(8):
        out_ref[i] = cv[i]


def chunk_cvs_pallas3(words, chunk_base, tile_c: int = 8, tile_r: int = 128,
                      interpret: bool = False):
    """v3 chunk-CV kernel.  words: (n_chunks, 16, 16, R) u32; chunk_base: i32
    scalar (traced ok).  Returns (r0, r1) each (4, n_chunks, R)."""
    n, _, _, R = words.shape
    tc = min(tile_c, max(n, 1))
    rt = min(tile_r, R)
    npad = ((n + tc - 1) // tc) * tc
    rpad = ((R + rt - 1) // rt) * rt  # lane-pad odd rep counts (e.g. 40/216)
    wb = jnp.moveaxis(words, 1, 0)  # (16, n, 16, R) -- fuses into byte->word
    if npad != n:
        wb = jnp.concatenate(
            [wb, jnp.zeros((16, npad - n, 16, R), U32)], axis=1
        )
    if rpad != R:
        wb = jnp.concatenate(
            [wb, jnp.zeros((16, npad, 16, rpad - R), U32)], axis=3
        )
    out = pl.pallas_call(
        functools.partial(_chunk_kernel_v3, tc),
        out_shape=jax.ShapeDtypeStruct((8, npad, rpad), U32),
        grid=(npad // tc, rpad // rt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((16, tc, 16, rt), lambda i, j: (0, i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tc, rt), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(chunk_base, jnp.int32).reshape(1), wb)
    out = out[:, :n, :R]  # (8, n, R)
    return out[:4], out[4:]


def chunk_cvs_pallas2(words, chunk_base, tile_c: int = 8, tile_r: int = 128,
                      interpret: bool = False):
    """v2 chunk-CV kernel.  words: (n_chunks, 16, 16, R) u32; chunk_base: i32
    scalar (traced ok).  Returns (r0, r1) each (4, n_chunks, R)."""
    n, _, _, R = words.shape
    tc = min(tile_c, max(n, 1))
    rt = min(tile_r, R)
    npad = ((n + tc - 1) // tc) * tc
    rpad = ((R + rt - 1) // rt) * rt  # lane-pad odd rep counts (e.g. 40/216)
    # (16, 16, n, R): message words for one (blk, w) are contiguous lane
    # tiles; XLA fuses this transpose into the byte->word conversion pass
    wb = jnp.transpose(words, (1, 2, 0, 3))
    if npad != n:
        wb = jnp.concatenate(
            [wb, jnp.zeros((16, 16, npad - n, R), U32)], axis=2
        )
    if rpad != R:
        wb = jnp.concatenate(
            [wb, jnp.zeros((16, 16, npad, rpad - R), U32)], axis=3
        )
    out = pl.pallas_call(
        functools.partial(_chunk_kernel_v2, tc),
        out_shape=jax.ShapeDtypeStruct((8, npad, rpad), U32),
        grid=(npad // tc, rpad // rt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((16, 16, tc, rt), lambda i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tc, rt), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(chunk_base, jnp.int32).reshape(1), wb)
    out = out[:, :n, :R]  # (8, n, R)
    return out[:4], out[4:]


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
