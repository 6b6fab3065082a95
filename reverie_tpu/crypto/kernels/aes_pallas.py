"""Pallas TPU kernel: bitsliced AES-128-CTR keystream -> GF2 tape words.

The XLA version (aes_jax.py) materializes the 512 MB plane state in HBM every
round (optimization barriers); this kernel keeps the full bitsliced state in
VMEM across all 10 rounds and writes each block-tile's keystream once.

State layout per grid step (one tile of TB counter blocks):
  planes[byte][bit] : (Kw, TB) u32   -- Kw = keys/32 sublanes, TB lanes
ShiftRows is a list permutation (free); MixColumns a few XORs; SubBytes runs
the 113-gate Boyar-Peralta circuit per byte position (small live set).
AES is compute-bound here: ~2000 bit-ops per 16-byte block per instance;
speed-of-light on the VPU is ~17 ms for a 512 MB keystream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sbox_circuit import sbox_bitsliced

U32 = jnp.uint32


def _aes_kernel(rkp_ref, ctr_ref, out_ref):
    rkp = rkp_ref[:]  # (11, 16, 8, Kw)
    ctr = ctr_ref[:]  # (16, 8, TB) int32 0/1
    Kw = rkp.shape[-1]
    TB = ctr.shape[-1]

    ones = jnp.asarray(0xFFFFFFFF, U32)

    # planes[byte][bit]: (Kw, TB)
    planes = [
        [
            jnp.broadcast_to(
                jnp.where(ctr[by, bit, :] != 0, ones, jnp.asarray(0, U32))[None, :],
                (Kw, TB),
            )
            ^ rkp[0, by, bit, :, None]
            for bit in range(8)
        ]
        for by in range(16)
    ]

    def sub_bytes(planes):
        out = []
        for by in range(16):
            msb = [planes[by][7 - i] for i in range(8)]
            sb = sbox_bitsliced(msb, lambda a, b: a ^ b, lambda a, b: a & b,
                                lambda a: ~a)
            out.append([sb[7 - i] for i in range(8)])
        return out

    def shift_rows(planes):
        return [planes[4 * ((i // 4 + i % 4) % 4) + (i % 4)] for i in range(16)]

    def xtime(bits):
        b = bits
        return [b[7], b[0] ^ b[7], b[1], b[2] ^ b[7], b[3] ^ b[7], b[4], b[5], b[6]]

    def mix_columns(planes):
        out = [None] * 16
        for c in range(4):
            rows = [planes[4 * c + r] for r in range(4)]
            xt = [xtime(r) for r in rows]
            out[4 * c + 0] = [xt[0][i] ^ xt[1][i] ^ rows[1][i] ^ rows[2][i] ^ rows[3][i] for i in range(8)]
            out[4 * c + 1] = [rows[0][i] ^ xt[1][i] ^ xt[2][i] ^ rows[2][i] ^ rows[3][i] for i in range(8)]
            out[4 * c + 2] = [rows[0][i] ^ rows[1][i] ^ xt[2][i] ^ xt[3][i] ^ rows[3][i] for i in range(8)]
            out[4 * c + 3] = [xt[0][i] ^ rows[0][i] ^ rows[1][i] ^ rows[2][i] ^ xt[3][i] for i in range(8)]
        return out

    def add_round_key(planes, rnd):
        return [
            [planes[by][bit] ^ rkp[rnd, by, bit, :, None] for bit in range(8)]
            for by in range(16)
        ]

    for rnd in range(1, 10):
        planes = sub_bytes(planes)
        planes = shift_rows(planes)
        planes = mix_columns(planes)
        planes = add_round_key(planes, rnd)
    planes = sub_bytes(planes)
    planes = shift_rows(planes)
    planes = add_round_key(planes, 10)

    for by in range(16):
        for bit in range(8):
            out_ref[by, bit] = planes[by][bit]


def aes_ctr_planes_pallas(rkp, ctrp_i32, tile_b: int = 256, interpret: bool = False):
    """rkp: (11, 16, 8, Kw) u32; ctrp_i32: (16, 8, B) int32 (B % tile_b == 0).
    Returns keystream planes (16, 8, Kw, B) u32."""
    Kw = rkp.shape[-1]
    B = ctrp_i32.shape[-1]
    assert B % tile_b == 0
    grid = (B // tile_b,)
    return pl.pallas_call(
        _aes_kernel,
        out_shape=jax.ShapeDtypeStruct((16, 8, Kw, B), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((11, 16, 8, Kw), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 8, tile_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, 8, Kw, tile_b), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rkp, ctrp_i32)


def aes_ctr_tape_gf2_pallas(rkp, ctrp_i32, lane_mask, tile_b: int = 256,
                            interpret: bool = False):
    """Drop-in equivalent of aes_jax.aes_ctr_tape_gf2 using the Pallas core.
    Returns (B*128, 4*Kw) uint8 GF2 tape."""
    Kw = rkp.shape[-1]
    B = ctrp_i32.shape[-1]
    planes = aes_ctr_planes_pallas(rkp, ctrp_i32, tile_b, interpret)
    # m = block*128 + byte*8 + j uses bit (7-j)
    words = jnp.transpose(planes[:, ::-1], (3, 0, 1, 2)).reshape(B * 128, Kw)
    m1, m2_, m4 = (jnp.asarray(v, U32) for v in (0x55555555, 0x33333333, 0x0F0F0F0F))
    words = ((words & m1) << 1) | ((words >> 1) & m1)
    words = ((words & m2_) << 2) | ((words >> 2) & m2_)
    words = ((words & m4) << 4) | ((words >> 4) & m4)
    words = words & lane_mask[None, :]
    by = jax.lax.bitcast_convert_type(words, jnp.uint8)
    return by.reshape(B * 128, Kw * 4)
