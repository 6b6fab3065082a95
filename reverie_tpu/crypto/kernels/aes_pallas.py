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

from .aes_jax import _SHIFT_ROWS
from .sbox_circuit import sbox_bitsliced

U32 = jnp.uint32


def _aes_kernel(rkp_ref, ctr_ref, out_ref):
    """State as one (16, 8, Kw, TB) u32 tensor; rounds via fori_loop (small
    trace); SubBytes via an inner fori over byte positions (small VMEM live
    set)."""
    ctr = ctr_ref[:]  # (16, 8, TB) int32 0/1
    Kw = rkp_ref.shape[-1]
    TB = ctr.shape[-1]

    ones = jnp.asarray(0xFFFFFFFF, U32)
    init = jnp.where(ctr[:, :, None, :] != 0, ones, jnp.asarray(0, U32)) ^ \
        rkp_ref[0][:, :, :, None]  # (16, 8, Kw, TB)

    def sub_bytes(planes):
        # static unroll over the 16 byte positions (Mosaic has no dynamic
        # value indexing); the round loop is a fori so this traces once
        out = []
        for by in range(16):
            msb = [planes[by, 7 - i] for i in range(8)]
            sb = sbox_bitsliced(msb, lambda a, b: a ^ b, lambda a, b: a & b,
                                lambda a: ~a)
            out.append(jnp.stack([sb[7 - i] for i in range(8)]))
        return jnp.stack(out)

    def shift_rows(planes):
        # static permutation of the byte axis (no captured index constants)
        return jnp.stack([planes[int(j)] for j in _SHIFT_ROWS])

    def mix_columns(planes):
        # planes: (16, 8, Kw, TB); rows r = byte indices r::4
        rows = planes.reshape(4, 4, 8, Kw, TB)  # (col, row, bit, ...)
        r = [rows[:, i] for i in range(4)]  # each (4cols, 8, Kw, TB)

        def xt(a):
            return jnp.stack(
                [a[:, 7], a[:, 0] ^ a[:, 7], a[:, 1], a[:, 2] ^ a[:, 7],
                 a[:, 3] ^ a[:, 7], a[:, 4], a[:, 5], a[:, 6]], axis=1)

        x = [xt(a) for a in r]
        n0 = x[0] ^ x[1] ^ r[1] ^ r[2] ^ r[3]
        n1 = r[0] ^ x[1] ^ x[2] ^ r[2] ^ r[3]
        n2 = r[0] ^ r[1] ^ x[2] ^ x[3] ^ r[3]
        n3 = x[0] ^ r[0] ^ r[1] ^ r[2] ^ x[3]
        return jnp.stack([n0, n1, n2, n3], axis=1).reshape(16, 8, Kw, TB)

    def round_body(rnd, planes):
        planes = sub_bytes(planes)
        planes = shift_rows(planes)
        planes = mix_columns(planes)
        # dynamic round-key read stays a *ref* index (Mosaic supports it)
        return planes ^ rkp_ref[rnd][:, :, :, None]

    planes = jax.lax.fori_loop(1, 10, round_body, init)
    planes = sub_bytes(planes)
    planes = shift_rows(planes)
    planes = planes ^ rkp_ref[10][:, :, :, None]
    out_ref[:] = planes


def aes_ctr_planes_pallas(rkp, ctrp_i32, tile_b: int = 128, interpret: bool = False):
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


def aes_ctr_tape_gf2_pallas(rkp, ctrp_i32, lane_mask, tile_b: int = 128,
                            interpret: bool = False):
    """Drop-in equivalent of aes_jax.aes_ctr_tape_gf2 using the Pallas core.
    Returns (B*128, 4*Kw) uint8 GF2 tape.  Pads B up to a tile multiple."""
    Kw = rkp.shape[-1]
    B = ctrp_i32.shape[-1]
    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    if Bp != B:
        ctrp_i32 = jnp.concatenate(
            [ctrp_i32, jnp.zeros((16, 8, Bp - B), ctrp_i32.dtype)], axis=-1
        )
    planes = aes_ctr_planes_pallas(rkp, ctrp_i32, tile_b, interpret)
    planes = planes[..., :B]
    # m = block*128 + byte*8 + j uses bit (7-j)
    words = jnp.transpose(planes[:, ::-1], (3, 0, 1, 2)).reshape(B * 128, Kw)
    m1, m2_, m4 = (jnp.asarray(v, U32) for v in (0x55555555, 0x33333333, 0x0F0F0F0F))
    words = ((words & m1) << 1) | ((words >> 1) & m1)
    words = ((words & m2_) << 2) | ((words >> 2) & m2_)
    words = ((words & m4) << 4) | ((words >> 4) & m4)
    words = words & lane_mask[None, :]
    by = jax.lax.bitcast_convert_type(words, jnp.uint8)
    return by.reshape(B * 128, Kw * 4)
