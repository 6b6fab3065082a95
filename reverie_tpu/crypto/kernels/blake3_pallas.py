"""Pallas TPU kernel: BLAKE3 full-chunk CVs straight from transcript BYTES.

The transcript buffers are (T, R) uint8 tensors whose columns are the
per-repetition streams (reference absorbs them byte-serially on the host,
crypto/hash.rs:28-104).  The XLA path pays for a materialized bytes->words
pass -- a strided uint8 read plus a 0.5 GB u32 intermediate at the 1M-gate
shape -- before its word scan ever starts (round-3 measurement: 27 ms
production vs 9 ms on pre-materialized words).  This kernel removes that
pass entirely:

  * the byte->word combine is a `pltpu.bitcast` u8->u32: four consecutive
    sublanes (= four consecutive stream bytes of one rep) reinterpret as one
    little-endian u32 -- the exact BLAKE3 word load, for free;
  * one in-VMEM corner turn per tile ((TC, 256, RT) -> (256, TC, RT)) makes
    every message word of every block a contiguous (TC, RT) vreg tile;
  * the 16-word state lives in vregs across a chunk's 16 blocks (all 16
    blocks x 7 rounds x 8 G mixes fully unrolled -- pure VPU add/xor/rot
    with zero relayouts in the hot loop).

Scope: *bulk* full chunks only (16 blocks x 64 B, non-root), like the v1-v3
word-based kernels this file replaces (round-3 HW data: all three lost to
the XLA word scan; the from-bytes form is the round-4 design from
BASELINE.md's roofline).  Round-4 measured: production hash_columns at
T=2M/R=256 runs 3.47 ms = 147.6 GB/s by the RTT-cancelled slope method
(>=80 GB/s bar met; byte-exact on HW at R=256/128/40 -- tools/r4_hw1.py
fbcheck, tools/r4_devlim.py).  The final chunk / tree reduction stays in XLA
(negligible bytes).  The XLA path (blake3_jax._chunk_cvs*) remains the
differential oracle.
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


def _fb_kernel(tc: int, transpose: bool, unroll: bool, base_ref, bytes_ref,
               out_ref):
    """bytes_ref: (TC*1024, RT) u8 -- TC whole chunks for RT reps;
    out_ref: (8, TC, RT) u32 chunk CVs; base_ref: (1,) SMEM global chunk
    counter of this call's chunk 0.

    unroll=True statically unrolls the 16-block chunk scan (the TPU form:
    every m word is a static read, no loop carry); unroll=False runs a
    fori_loop body (used in interpret mode, where XLA:CPU's pipeline is
    superlinear on the ~13k-op unrolled graph -- same pathology as the
    chained compress_words graphs, blake3_jax.py round-2c note)."""
    TC = tc
    RT = out_ref.shape[-1]
    ctr = (
        base_ref[0].astype(U32)
        + (pl.program_id(0) * TC).astype(U32)
        + jax.lax.broadcasted_iota(U32, (TC, RT), 0)
    )
    # four consecutive stream bytes -> one LE u32 message word, for free
    xw = pltpu.bitcast(bytes_ref[...], U32)  # (TC*256, RT)
    xw = xw.reshape(TC, 256, RT)
    if transpose:
        # one corner turn per tile; every m word below is then a contiguous
        # (TC, RT) tile read instead of a strided sublane gather
        y = jnp.moveaxis(xw, 1, 0)  # (256, TC, RT)

        def mword(blk, w):
            if isinstance(blk, int):
                return y[blk * 16 + w]
            return jax.lax.dynamic_index_in_dim(y, blk * 16 + w, 0, False)
    else:
        def mword(blk, w):
            if isinstance(blk, int):
                return xw[:, blk * 16 + w, :]
            return jax.lax.dynamic_index_in_dim(xw, blk * 16 + w, 1, False)

    zeros = jnp.zeros((TC, RT), U32)
    blen = jnp.full((TC, RT), np.uint32(64), U32)

    def block_body(blk, cv):
        m = [mword(blk, w) for w in range(16)]
        if isinstance(blk, int):
            flags = jnp.full((TC, RT), np.uint32(
                (CHUNK_START if blk == 0 else 0)
                | (CHUNK_END if blk == 15 else 0)), U32)
        else:
            f = jnp.where(blk == 0, np.uint32(CHUNK_START), np.uint32(0)) | (
                jnp.where(blk == 15, np.uint32(CHUNK_END), np.uint32(0)))
            flags = jnp.broadcast_to(f.astype(U32), (TC, RT))
        v = [
            cv[0], cv[1], cv[2], cv[3], cv[4], cv[5], cv[6], cv[7],
            jnp.full((TC, RT), IV[0], U32), jnp.full((TC, RT), IV[1], U32),
            jnp.full((TC, RT), IV[2], U32), jnp.full((TC, RT), IV[3], U32),
            ctr, zeros, blen, flags,
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

    cv = tuple(jnp.full((TC, RT), IV[i], U32) for i in range(8))
    if unroll:
        for blk in range(16):
            cv = block_body(blk, cv)
    else:
        cv = jax.lax.fori_loop(0, 16, block_body, cv)
    for i in range(8):
        out_ref[i] = cv[i]


def chunk_cvs_from_bytes(buf, n_chunks: int, chunk_base, tile_c: int = 8,
                         tile_r: int = 128, transpose: bool = True,
                         unroll: bool | None = None,
                         interpret: bool = False):
    """CVs of `n_chunks` full chunks from the natural byte layout.

    buf: (>= n_chunks*1024 rows, R) uint8 transcript bytes (columns = reps);
    rows beyond n_chunks*1024 are ignored.  chunk_base: i32 scalar (traced
    ok), the global counter of chunk 0.  Returns (r0, r1) each
    (4, n_chunks, R) u32 -- drop-in for blake3_jax's bulk chunk-CV calls.
    """
    if unroll is None:
        unroll = not interpret
    R = buf.shape[1]
    tc = min(tile_c, max(n_chunks, 1))
    rt = min(tile_r, R) if R % 128 == 0 else tile_r
    npad = ((n_chunks + tc - 1) // tc) * tc
    rpad = ((R + rt - 1) // rt) * rt  # lane-pad odd rep counts (e.g. 40/216)
    # rows need NOT pad to the tile multiple: Pallas masks boundary blocks
    # (garbage CVs in the pad region are sliced off below), so the 0.5 GB
    # transcript never takes a pad copy
    if buf.shape[0] < n_chunks * 1024:
        raise ValueError("buffer shorter than n_chunks*1024 rows")
    if rpad != R:
        buf = jnp.concatenate(
            [buf, jnp.zeros((buf.shape[0], rpad - R), jnp.uint8)], axis=1
        )
    out = pl.pallas_call(
        functools.partial(_fb_kernel, tc, transpose, unroll),
        out_shape=jax.ShapeDtypeStruct((8, npad, rpad), U32),
        grid=(npad // tc, rpad // rt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tc * 1024, rt), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tc, rt), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(chunk_base, jnp.int32).reshape(1), buf)
    out = out[:, :n_chunks, :R]  # (8, n, R)
    return out[:4], out[4:]
