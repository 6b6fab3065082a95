"""Pallas TPU kernel: bitsliced AES-128-CTR keystream -> GF2 tape words.

The XLA version (aes_jax.py) materializes the 512 MB plane state in HBM every
round (optimization barriers); this kernel keeps the full bitsliced state in
VMEM across all 10 rounds and writes each block-tile's keystream once.

State layout per grid step (one tile of TB counter blocks):
  planes[byte][bit] : (Kw, TB) u32   -- Kw = keys/32 sublanes, TB lanes
ShiftRows is a list permutation (free); MixColumns a few XORs; SubBytes runs
the 113-gate Boyar-Peralta circuit per byte position (small live set).
AES is compute-bound here: ~2000 bit-ops per 16-byte block per instance;
speed-of-light on the VPU is ~17 ms for a 512 MB keystream.  Round-4
measured (column-scheduled round body, default): 12.0 ms by the RTT-
cancelled slope method at the 1M-gate tape shape (B=15626, 2048 keys) --
see BASELINE.md round-4 accounting and tools/r4_devlim.py.
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


def _aes_kernel(tb: int, rkp_ref, out_ref):
    """State as a tuple of 128 (TB, Kw) u32 planes (byte-major, bit-minor):
    ~32 KB each keeps the VMEM live-set small.  Rounds run under a fori_loop
    with the plane tuple as carry; round keys are read per round via a
    dynamic *ref* index (supported by Mosaic).  Counter-block bits are
    derived in-kernel from the grid position (big-endian 128-bit CTR with
    the low 64 bits = block index)."""
    Kw = rkp_ref.shape[-1]
    TB = tb

    rk0 = rkp_ref[0]  # (16, 8, Kw)
    base = (pl.program_id(0) * TB).astype(U32)
    idx = base + jax.lax.broadcasted_iota(U32, (TB, Kw), 0)

    def init_plane(by, bit):
        rk = rk0[by, bit][None, :]  # (1, Kw)
        shift = 8 * (15 - by) + bit
        if by < 8 or shift >= 32:
            return jnp.broadcast_to(rk, (TB, Kw))
        bitval = (idx >> np.uint32(shift)) & jnp.asarray(1, U32)
        return (jnp.zeros((TB, Kw), U32) - bitval) ^ rk

    planes = tuple(init_plane(by, bit) for by in range(16) for bit in range(8))

    def sub_bytes(planes):
        out = []
        for by in range(16):
            msb = [planes[by * 8 + 7 - i] for i in range(8)]
            sb = sbox_bitsliced(msb, lambda a, b: a ^ b, lambda a, b: a & b,
                                lambda a: ~a)
            out.extend(sb[7 - i] for i in range(8))
        return tuple(out)

    def shift_rows(planes):
        return tuple(
            planes[int(_SHIFT_ROWS[by]) * 8 + bit]
            for by in range(16)
            for bit in range(8)
        )

    def xtime(b):
        return [b[7], b[0] ^ b[7], b[1], b[2] ^ b[7], b[3] ^ b[7], b[4], b[5], b[6]]

    def mix_columns(planes):
        out = [None] * 128
        for c in range(4):
            rows = [[planes[(4 * c + r) * 8 + bit] for bit in range(8)] for r in range(4)]
            xt = [xtime(r) for r in rows]
            for i in range(8):
                out[(4 * c + 0) * 8 + i] = xt[0][i] ^ xt[1][i] ^ rows[1][i] ^ rows[2][i] ^ rows[3][i]
                out[(4 * c + 1) * 8 + i] = rows[0][i] ^ xt[1][i] ^ xt[2][i] ^ rows[2][i] ^ rows[3][i]
                out[(4 * c + 2) * 8 + i] = rows[0][i] ^ rows[1][i] ^ xt[2][i] ^ xt[3][i] ^ rows[3][i]
                out[(4 * c + 3) * 8 + i] = xt[0][i] ^ rows[0][i] ^ rows[1][i] ^ rows[2][i] ^ xt[3][i]
        return tuple(out)

    def round_body(rnd, planes):
        planes = sub_bytes(planes)
        planes = shift_rows(planes)
        planes = mix_columns(planes)
        rk = rkp_ref[rnd]  # (16, 8, Kw) -- dynamic ref read
        return tuple(
            planes[by * 8 + bit] ^ rk[by, bit][None, :]
            for by in range(16)
            for bit in range(8)
        )

    planes = jax.lax.fori_loop(1, 10, round_body, planes)
    planes = sub_bytes(planes)
    planes = shift_rows(planes)
    rk10 = rkp_ref[10]
    for by in range(16):
        for bit in range(8):
            out_ref[by, bit] = planes[by * 8 + bit] ^ rk10[by, bit][None, :]


def aes_ctr_planes_pallas(rkp, n_blocks: int, tile_b: int = 32, interpret: bool = False):
    """rkp: (11, 16, 8, Kw) u32.  Returns keystream planes (16,8,B,Kw) u32."""
    Kw = rkp.shape[-1]
    assert n_blocks % tile_b == 0
    grid = (n_blocks // tile_b,)
    return pl.pallas_call(
        functools.partial(_aes_kernel, tile_b),
        out_shape=jax.ShapeDtypeStruct((16, 8, n_blocks, Kw), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((11, 16, 8, Kw), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, 8, tile_b, Kw), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rkp)


def _aes_tape_kernel(tb: int, bpr: int, unroll: bool, colsched: bool,
                     rkp_ref, mask_ref, start_ref, out_ref, out2_ref=None):
    """AES-CTR + tape assembly fused in one kernel.

    Extends _aes_kernel by writing the *tape words* directly: output element
    (b, by, j, kw) is the bit-reversed (player p at bit 7-p), lane-masked
    tape word for tape index b*128 + by*8 + j.  Doing the byte-reversal,
    bit-reversal, and masking in-kernel removes the XLA transpose/bit-twiddle
    fusion that the axon backend miscompiles at large B (round-2 triage:
    kernel correct at 15626 blocks, surrounding fusion diverges) and skips a
    full keystream round-trip through HBM.

    start_ref (SMEM scalar): global CTR block of output block 0 -- streaming
    segments window the tape at arbitrary offsets (backend/streaming.py) and
    a traced start keeps one compile for all uniform segments.

    bpr ("blocks per row"): lane-packing factor.  TPU vregs are (8, 128)
    lanes; a single proof has only Kw=64 key words, which would waste half of
    every lane.  The caller tiles the round keys/mask bpr times along the
    lane axis and we process bpr consecutive counter blocks per vector row:
    plane element (t, l) is counter block  base + t*bpr + l//Kw_real  for key
    l % Kw_real.  The caller de-interleaves the (TB/bpr, ..., bpr*Kw_real)
    output back to block-major order (one cheap XLA relayout).
    """
    Kw = rkp_ref.shape[-1]      # lane width incl. tiling (= bpr * Kw_real)
    TB = tb                     # counter blocks per grid step
    T = TB // bpr               # vector rows per grid step

    rk0 = rkp_ref[0]  # (16, 8, Kw)
    base = start_ref[0].astype(U32) + (pl.program_id(0) * TB).astype(U32)
    row = jax.lax.broadcasted_iota(U32, (T, Kw), 0)
    if bpr > 1:
        lane = jax.lax.broadcasted_iota(U32, (T, Kw), 1)
        kw_real = Kw // bpr
        assert kw_real & (kw_real - 1) == 0, "Kw_real must be a power of two"
        idx = base + row * np.uint32(bpr) + (lane >> np.uint32(kw_real.bit_length() - 1))
    else:
        idx = base + row

    def init_plane(by, bit):
        rk = rk0[by, bit][None, :]  # (1, Kw)
        shift = 8 * (15 - by) + bit
        if by < 8 or shift >= 32:
            return jnp.broadcast_to(rk, (T, Kw))
        bitval = (idx >> np.uint32(shift)) & jnp.asarray(1, U32)
        return (jnp.zeros((T, Kw), U32) - bitval) ^ rk

    planes = tuple(init_plane(by, bit) for by in range(16) for bit in range(8))

    def sub_bytes(planes):
        out = []
        for by in range(16):
            msb = [planes[by * 8 + 7 - i] for i in range(8)]
            sb = sbox_bitsliced(msb, lambda a, b: a ^ b, lambda a, b: a & b,
                                lambda a: ~a)
            out.extend(sb[7 - i] for i in range(8))
        return tuple(out)

    def shift_rows(planes):
        return tuple(
            planes[int(_SHIFT_ROWS[by]) * 8 + bit]
            for by in range(16)
            for bit in range(8)
        )

    def xtime(b):
        return [b[7], b[0] ^ b[7], b[1], b[2] ^ b[7], b[3] ^ b[7], b[4], b[5], b[6]]

    def mix_columns(planes):
        out = [None] * 128
        for c in range(4):
            rows = [[planes[(4 * c + r) * 8 + bit] for bit in range(8)] for r in range(4)]
            xt = [xtime(r) for r in rows]
            for i in range(8):
                out[(4 * c + 0) * 8 + i] = xt[0][i] ^ xt[1][i] ^ rows[1][i] ^ rows[2][i] ^ rows[3][i]
                out[(4 * c + 1) * 8 + i] = rows[0][i] ^ xt[1][i] ^ xt[2][i] ^ rows[2][i] ^ rows[3][i]
                out[(4 * c + 2) * 8 + i] = rows[0][i] ^ rows[1][i] ^ xt[2][i] ^ xt[3][i] ^ rows[3][i]
                out[(4 * c + 3) * 8 + i] = xt[0][i] ^ rows[0][i] ^ rows[1][i] ^ rows[2][i] ^ xt[3][i]
        return tuple(out)

    def round_body(rnd, planes):
        planes = sub_bytes(planes)
        planes = shift_rows(planes)
        planes = mix_columns(planes)
        rk = rkp_ref[rnd]  # (16, 8, Kw) -- dynamic ref read
        return tuple(
            planes[by * 8 + bit] ^ rk[by, bit][None, :]
            for by in range(16)
            for bit in range(8)
        )

    def round_body_cs(rnd, planes):
        """Column-scheduled round: identical math, reordered so each output
        column's 4 S-boxes + MixColumns + AddRoundKey complete before the
        next column starts.  The standard order computes all 16 S-boxes
        first, holding ~128 live planes plus S-box temps across the whole
        SubBytes pass -- 2x the vreg file at the production tile shape, so
        Mosaic spills; this order caps the live set at ~(128 inputs
        declining) + 32 outputs + one S-box's temps."""
        rk = rkp_ref[rnd]
        out = [None] * 128
        for c in range(4):
            rows = []
            for r in range(4):
                src = int(_SHIFT_ROWS[4 * c + r])
                msb = [planes[src * 8 + 7 - i] for i in range(8)]
                sb = sbox_bitsliced(msb, lambda a, b: a ^ b,
                                    lambda a, b: a & b, lambda a: ~a)
                rows.append([sb[7 - i] for i in range(8)])
            xt = [xtime(r_) for r_ in rows]
            for i in range(8):
                out[(4 * c + 0) * 8 + i] = (
                    xt[0][i] ^ xt[1][i] ^ rows[1][i] ^ rows[2][i] ^ rows[3][i]
                ) ^ rk[4 * c + 0, i][None, :]
                out[(4 * c + 1) * 8 + i] = (
                    rows[0][i] ^ xt[1][i] ^ xt[2][i] ^ rows[2][i] ^ rows[3][i]
                ) ^ rk[4 * c + 1, i][None, :]
                out[(4 * c + 2) * 8 + i] = (
                    rows[0][i] ^ rows[1][i] ^ xt[2][i] ^ xt[3][i] ^ rows[3][i]
                ) ^ rk[4 * c + 2, i][None, :]
                out[(4 * c + 3) * 8 + i] = (
                    xt[0][i] ^ rows[0][i] ^ rows[1][i] ^ rows[2][i] ^ xt[3][i]
                ) ^ rk[4 * c + 3, i][None, :]
        return tuple(out)

    body = round_body_cs if colsched else round_body
    if unroll or colsched:
        # static rounds: no 128-plane loop carry (the fori_loop form makes
        # Mosaic round-trip the whole state through VMEM every round)
        for rnd in range(1, 10):
            planes = body(rnd, planes)
    else:
        planes = jax.lax.fori_loop(1, 10, body, planes)
    mask = mask_ref[0][None, :]  # (1, Kw)
    m1, m2_, m4 = (jnp.asarray(v, U32) for v in (0x55555555, 0x33333333, 0x0F0F0F0F))
    kwr = Kw // bpr
    rk10 = rkp_ref[10]

    def emit(by, j, w):
        # bit-reverse within each byte lane: player p -> bit (7-p)
        w = ((w & m1) << 1) | ((w >> 1) & m1)
        w = ((w & m2_) << 2) | ((w >> 2) & m2_)
        w = ((w & m4) << 4) | ((w >> 4) & m4)
        w = w & mask
        # split-plane emit (out2_ref set): tape slot b*128 + by*8 + j goes to
        # the even (j % 2 == 0) or odd plane at word w = by*4 + j//2 -- the
        # executor's stride-2 MUL tape runs (tape_ab even slots, tape_new
        # odd) become CONTIGUOUS plane windows, read at ~760 GB/s instead of
        # the ~146 GB/s pair-window relayout (tools/r3_exec_ablate.py,
        # round-4 part).  Routing here is free: j is a Python loop index.
        # The plane's 64 words/block are laid out (8, 8) so the array's
        # last-two dims tile (8, Kw) -- a (16, 4, Kw) layout would pad the
        # 4-sublane dim to 8 and double the HBM write bytes (measured
        # +2.6 ms on the 1M tape).
        if out2_ref is not None:
            ref = out_ref if j % 2 == 0 else out2_ref
            wi = by * 4 + j // 2
            ixs = (wi // 8, wi % 8)
        else:
            ref = out_ref
            ixs = (by, j)
        if bpr > 1:
            # de-interleave the lane groups in-kernel: block t*bpr + g
            # lives in lanes [g*kwr, (g+1)*kwr); storing block-major here
            # keeps the XLA tail a pure reshape (a post-kernel moveaxis
            # transposes a >= GiB temp whose minor dims pad 16x in HBM
            # at streaming-segment sizes -- 64 GiB alloc at B=32768)
            for g in range(bpr):
                ref[:, g, ixs[0], ixs[1]] = w[:, g * kwr : (g + 1) * kwr]
        else:
            ref[:, ixs[0], ixs[1]] = w

    if colsched:
        # final round, byte-at-a-time: one S-box live at a time, each output
        # byte's 8 tape words emitted straight from its S-box
        for by in range(16):
            src = int(_SHIFT_ROWS[by])
            msb = [planes[src * 8 + 7 - i] for i in range(8)]
            sb = sbox_bitsliced(msb, lambda a, b: a ^ b,
                                lambda a, b: a & b, lambda a: ~a)
            for j in range(8):
                # tape index b*128 + by*8 + j reads keystream bit (7-j)
                emit(by, j, sb[j] ^ rk10[by, 7 - j][None, :])
    else:
        planes = sub_bytes(planes)
        planes = shift_rows(planes)
        for by in range(16):
            for j in range(8):
                emit(by, j, planes[by * 8 + (7 - j)] ^ rk10[by, 7 - j][None, :])


def aes_ctr_tape_gf2_pallas(rkp, n_blocks: int, lane_mask, start_block=0,
                            tile_b: int = 32, tile_kw: int = 64,
                            interpret: bool = False, unroll: bool = False,
                            colsched: bool | None = None,
                            split: bool = False, u8_out: bool = False):
    """Drop-in equivalent of aes_jax.aes_ctr_tape_gf2, fully in-kernel.
    Returns (B*128, 4*Kw) uint8 GF2 tape.  Pads B up to a tile multiple and
    grids over the lane axis (tile_kw) so batch-prove lane counts (Kw = N*64)
    stay within VMEM.  start_block (int or traced i32 scalar): CTR base, for
    streaming-segment tape windows.  colsched selects the column-scheduled
    round body (default ON for compiled TPU runs -- 2x on HW, byte-checked
    vs the std body on hardware in tools/r4_hw1.py `aes`; OFF in interpret
    mode, where XLA:CPU's superlinear pipeline makes the unrolled colsched
    graph uncompilable.  REVERIE_AES_COLSCHED=0 forces the std body)."""
    import os as _os

    if colsched is None:
        env = _os.environ.get("REVERIE_AES_COLSCHED")
        if env is not None:
            colsched = env not in ("", "0")
        else:
            colsched = not interpret
    Kw = rkp.shape[-1]
    B = n_blocks
    mask2d = lane_mask.reshape(1, Kw)
    # lane packing: vregs are (8, 128) -- when Kw < 128 (single proof Kw=64)
    # tile the keys bpr times along lanes and pack bpr consecutive counter
    # blocks per vector row, so every lane does real work (2x fewer vops)
    bpr = 128 // Kw if (Kw < 128 and 128 % Kw == 0) else 1
    if bpr > 1:
        rkp = jnp.concatenate([rkp] * bpr, axis=-1)
        mask2d = jnp.concatenate([mask2d] * bpr, axis=-1)
    L = Kw * bpr  # kernel lane width
    # lane-axis tile: Pallas requires the minor block dim to be 128-divisible
    # or equal to the full axis; batch lanes are Kw = N*64
    if L % 128 == 0:
        kwt = min(((tile_kw + 127) // 128) * 128, L)
        if L % kwt:
            kwt = 128
    else:
        kwt = L  # odd-N batches (e.g. Kw=192): whole axis
    # (bpr > 1 implies Kw=64, L=128, kwt=128: packed kernels never lane-grid)
    if tile_b % bpr:
        tile_b = max(bpr, (tile_b // bpr) * bpr)
    # keep the block working set (~128 planes in + 128 out, u32) within VMEM
    while tile_b > 8 * bpr and 2 * 128 * (tile_b // bpr) * kwt * 4 > 8 * 1024 * 1024:
        tile_b //= 2
    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    grid = (Bp // tile_b, L // kwt)
    # split planes hold 64 words/block laid out (8, 8); unsplit 128 as (16, 8)
    d2, d3 = (8, 8) if split else (16, 8)
    if bpr > 1:
        # block-major output written in-kernel: (t, g, by, j, k) is counter
        # block t*bpr + g, key k -- already row-major tape order, so the
        # tail below is a free reshape (no transpose of a huge temp)
        out_shape = jax.ShapeDtypeStruct((Bp // bpr, bpr, d2, d3, Kw),
                                         jnp.uint32)
        out_specs = pl.BlockSpec((tile_b // bpr, bpr, d2, d3, Kw),
                                 lambda i, k: (i, 0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((Bp, d2, d3, L), jnp.uint32)
        out_specs = pl.BlockSpec((tile_b, d2, d3, kwt),
                                 lambda i, k: (i, 0, 0, k),
                                 memory_space=pltpu.VMEM)
    if split:
        out_shape = (out_shape, out_shape)
        out_specs = (out_specs, out_specs)
    words = pl.pallas_call(
        functools.partial(_aes_tape_kernel, tile_b, bpr, unroll, colsched),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((11, 16, 8, kwt), lambda i, k: (0, 0, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kwt), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        interpret=interpret,
        out_specs=out_specs,
    )(rkp, mask2d, jnp.asarray(start_block, jnp.int32).reshape(1))

    # contiguous flatten to rows first, then the exact aes_jax byte-split
    # tail (2-D bitcast): bitcasting the 4/5-D form makes XLA's layout pass
    # materialize a transposed padded temp (64 GiB at B=32768)
    def _tail(w, rows_per_block):
        n = Bp * rows_per_block
        w = w.reshape(n, Kw)
        if u8_out:
            # Pallas relayout instead of the XLA bitcast: XLA's u32->u8
            # tiling change runs at ~85-125 GB/s over the 512 MB tape
            # (~8-10 ms at the 1M shape, materialized or fused into the
            # executor's reads); the 2-D concat kernel does it at near
            # stream rate.  Lane order comes out permuted (byte-plane
            # concat) -- the caller pre-permutes the key rows so the
            # result is in exact repetition order (u8emit_byte_perm).
            return u32_rows_to_u8_rows(w, interpret)[: B * rows_per_block]
        by = jax.lax.bitcast_convert_type(w, jnp.uint8)  # (n, Kw, 4)
        return by.reshape(n, Kw * 4)[: B * rows_per_block]

    if split:
        return _tail(words[0], 64), _tail(words[1], 64)
    return _tail(words, 128)


def _u8_relayout_kernel(in_ref, out_ref):
    w = in_ref[...]  # (T, Kw) u32
    parts = [(w >> np.uint32(8 * b)).astype(jnp.uint8) for b in range(4)]
    out_ref[...] = jnp.concatenate(parts, axis=1)  # (T, 4Kw) u8


def u32_rows_to_u8_rows(w, interpret: bool = False, rows_per_step: int = 512):
    """(n, Kw) u32 -> (n, 4*Kw) u8 with out lane b*Kw + k = byte b of word
    k (byte-plane-concat order -- the only u32->u8 lane fan-out Mosaic
    compiles; the 4k+b bitcast interleave is an unsupported shape cast).
    Row counts here are always multiples of 512 (Bp is a tile_b multiple
    and every block contributes 64/128 rows)."""
    n, Kw = w.shape
    T = rows_per_step
    # block working set: T*Kw*4 in + T*4*Kw out = 8*T*Kw bytes; cap at
    # ~4 MB so batch lane counts (Kw = N*64, e.g. 4096 at N=64) stay
    # within scoped VMEM (the 1M single-proof shape Kw=64 keeps T=512)
    while T > 8 and 8 * T * Kw > 4 * 1024 * 1024:
        T //= 2
    while n % T:
        T //= 2
    return pl.pallas_call(
        _u8_relayout_kernel,
        out_shape=jax.ShapeDtypeStruct((n, 4 * Kw), jnp.uint8),
        grid=(n // T,),
        in_specs=[pl.BlockSpec((T, Kw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, 4 * Kw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(w)


def _aes_tape_z64_kernel(tb: int, bpr: int, colsched: bool,
                         rkp_ref, mask_ref, start_ref, lo_ref, hi_ref):
    """AES-CTR keystream -> z64 mask tape, fully in-kernel (round 5).

    The XLA path (aes_jax.aes_ctr_tape_z64_chunked) pays a bitslice->byte
    untranspose through HBM-materialized (16,B,Kw,32) intermediates --
    measured 585 ms for the 50k-mul tape (1.6 GB keystream) vs ~25 ms of
    AES ALU at the Pallas gf2 kernel's rate.  Here the untranspose runs
    in vregs: per byte position, an 8x8 SWAR bit-matrix transpose turns 8
    bit planes into per-key bytes; per output word, a 4x4 SWAR byte
    transpose assembles the LE u32 halves (numpy-validated in
    tools/r5_zswar.py).  Output element [t, g, w*32 + (q*8+j), l] is the
    lo/hi u32 of CTR word (2*(t*bpr+g) + w) for kernel key 32l + 8q + j;
    the caller feeds key rows permuted so that flattening yields
    (slots, 8, R) in player-major repetition order
    (aes_ctr_tape_z64_pallas).  AES core (CTR init, column-scheduled
    rounds) matches _aes_tape_kernel."""
    Kw = rkp_ref.shape[-1]
    TB = tb
    T = TB // bpr

    rk0 = rkp_ref[0]
    base = start_ref[0].astype(U32) + (pl.program_id(0) * TB).astype(U32)
    row = jax.lax.broadcasted_iota(U32, (T, Kw), 0)
    if bpr > 1:
        lane = jax.lax.broadcasted_iota(U32, (T, Kw), 1)
        kw_real = Kw // bpr
        assert kw_real & (kw_real - 1) == 0
        idx = base + row * np.uint32(bpr) + (
            lane >> np.uint32(kw_real.bit_length() - 1))
    else:
        idx = base + row

    def init_plane(by, bit):
        rk = rk0[by, bit][None, :]
        shift = 8 * (15 - by) + bit
        if by < 8 or shift >= 32:
            return jnp.broadcast_to(rk, (T, Kw))
        bitval = (idx >> np.uint32(shift)) & jnp.asarray(1, U32)
        return (jnp.zeros((T, Kw), U32) - bitval) ^ rk

    planes = tuple(init_plane(by, bit) for by in range(16) for bit in range(8))

    def xtime(b):
        return [b[7], b[0] ^ b[7], b[1], b[2] ^ b[7], b[3] ^ b[7], b[4],
                b[5], b[6]]

    def round_body_cs(rnd, planes):
        rk = rkp_ref[rnd]
        out = [None] * 128
        for c in range(4):
            rows = []
            for r in range(4):
                src = int(_SHIFT_ROWS[4 * c + r])
                msb = [planes[src * 8 + 7 - i] for i in range(8)]
                sb = sbox_bitsliced(msb, lambda a, b: a ^ b,
                                    lambda a, b: a & b, lambda a: ~a)
                rows.append([sb[7 - i] for i in range(8)])
            xt = [xtime(r_) for r_ in rows]
            for i in range(8):
                out[(4 * c + 0) * 8 + i] = (
                    xt[0][i] ^ xt[1][i] ^ rows[1][i] ^ rows[2][i] ^ rows[3][i]
                ) ^ rk[4 * c + 0, i][None, :]
                out[(4 * c + 1) * 8 + i] = (
                    rows[0][i] ^ xt[1][i] ^ xt[2][i] ^ rows[2][i] ^ rows[3][i]
                ) ^ rk[4 * c + 1, i][None, :]
                out[(4 * c + 2) * 8 + i] = (
                    rows[0][i] ^ rows[1][i] ^ xt[2][i] ^ xt[3][i] ^ rows[3][i]
                ) ^ rk[4 * c + 2, i][None, :]
                out[(4 * c + 3) * 8 + i] = (
                    xt[0][i] ^ rows[0][i] ^ rows[1][i] ^ rows[2][i] ^ xt[3][i]
                ) ^ rk[4 * c + 3, i][None, :]
        return tuple(out)

    if colsched:
        for rnd in range(1, 10):
            planes = round_body_cs(rnd, planes)
    else:
        # interpret / XLA:CPU path: the unrolled column-scheduled rounds
        # make XLA:CPU's pipeline superlinear (same issue as the gf2
        # kernel); a fori_loop with the standard round body keeps the
        # graph O(1) in rounds
        def sub_bytes(planes):
            out = []
            for by in range(16):
                msb = [planes[by * 8 + 7 - i] for i in range(8)]
                sb = sbox_bitsliced(msb, lambda a, b: a ^ b,
                                    lambda a, b: a & b, lambda a: ~a)
                out.extend(sb[7 - i] for i in range(8))
            return tuple(out)

        def shift_rows(planes):
            return tuple(
                planes[int(_SHIFT_ROWS[by]) * 8 + bit]
                for by in range(16)
                for bit in range(8)
            )

        def mix_columns(planes):
            out = [None] * 128
            for c in range(4):
                rows = [[planes[(4 * c + r) * 8 + bit] for bit in range(8)]
                        for r in range(4)]
                xt = [xtime(r) for r in rows]
                for i in range(8):
                    out[(4 * c + 0) * 8 + i] = (xt[0][i] ^ xt[1][i]
                                                ^ rows[1][i] ^ rows[2][i]
                                                ^ rows[3][i])
                    out[(4 * c + 1) * 8 + i] = (rows[0][i] ^ xt[1][i]
                                                ^ xt[2][i] ^ rows[2][i]
                                                ^ rows[3][i])
                    out[(4 * c + 2) * 8 + i] = (rows[0][i] ^ rows[1][i]
                                                ^ xt[2][i] ^ xt[3][i]
                                                ^ rows[3][i])
                    out[(4 * c + 3) * 8 + i] = (xt[0][i] ^ rows[0][i]
                                                ^ rows[1][i] ^ rows[2][i]
                                                ^ xt[3][i])
            return tuple(out)

        def round_body(rnd, planes):
            planes = sub_bytes(planes)
            planes = shift_rows(planes)
            planes = mix_columns(planes)
            rk = rkp_ref[rnd]
            return tuple(
                planes[by * 8 + bit] ^ rk[by, bit][None, :]
                for by in range(16)
                for bit in range(8)
            )

        planes = jax.lax.fori_loop(1, 10, round_body, planes)

    mask = mask_ref[0][None, :]
    rk10 = rkp_ref[10]
    kwr = Kw // bpr

    def transpose_bits_8x8(w):
        w = list(w)
        for dm, pairs in (
            (4, (0, 1, 2, 3)),
            (2, (0, 1, 4, 5)),
            (1, (0, 2, 4, 6)),
        ):
            m = {4: jnp.asarray(0x0F0F0F0F, U32),
                 2: jnp.asarray(0x33333333, U32),
                 1: jnp.asarray(0x55555555, U32)}[dm]
            sh = np.uint32(dm)
            for b in pairs:
                x, y = w[b], w[b + dm]
                w[b] = (x & m) | ((y & m) << sh)
                w[b + dm] = ((x >> sh) & m) | (y & ~m)
        return w

    def transpose_bytes_4x4(a):
        m = jnp.asarray(0x0000FFFF, U32)
        b0 = (a[0] & m) | ((a[2] & m) << np.uint32(16))
        b2 = ((a[0] >> np.uint32(16)) & m) | (a[2] & ~m)
        b1 = (a[1] & m) | ((a[3] & m) << np.uint32(16))
        b3 = ((a[1] >> np.uint32(16)) & m) | (a[3] & ~m)
        m = jnp.asarray(0x00FF00FF, U32)
        o0 = (b0 & m) | ((b1 & m) << np.uint32(8))
        o1 = ((b0 >> np.uint32(8)) & m) | (b1 & ~m)
        o2 = (b2 & m) | ((b3 & m) << np.uint32(8))
        o3 = ((b2 >> np.uint32(8)) & m) | (b3 & ~m)
        return [o0, o1, o2, o3]

    # final round by-groups of 4: group g4 covers bytes 4*g4..+4 ->
    # (w = g4 // 2, lo/hi = g4 % 2); one S-box at a time keeps the live
    # set small (colsched discipline)
    for g4 in range(4):
        w_idx, is_hi = divmod(g4, 2)
        ref = hi_ref if is_hi else lo_ref
        tj = []  # [i][j] -> (T, Kw) u32: byte of key 8q+j at byte pos i
        for i in range(4):
            by = 4 * g4 + i
            src = int(_SHIFT_ROWS[by])
            msb = [planes[src * 8 + 7 - i2] for i2 in range(8)]
            sb = sbox_bitsliced(msb, lambda a, b: a ^ b,
                                lambda a, b: a & b, lambda a: ~a)
            # LSB-indexed bit planes of this keystream byte, masked
            pb = [(sb[7 - b] ^ rk10[by, b][None, :]) & mask for b in range(8)]
            tj.append(transpose_bits_8x8(pb))
        for j in range(8):
            oq = transpose_bytes_4x4([tj[i][j] for i in range(4)])
            for q in range(4):
                d2 = w_idx * 32 + q * 8 + j
                if bpr > 1:
                    for g in range(bpr):
                        ref[:, g, d2, :] = oq[q][:, g * kwr:(g + 1) * kwr]
                else:
                    ref[:, d2, :] = oq[q]


def z64emit_key_perm(R: int) -> np.ndarray:
    """Key-row permutation for the z64 Pallas tape kernel.

    The kernel's output position (q*8 + j)*Kw + l (flattened (slots, 8R))
    carries kernel key 32l + 8q + j; perm[32l + 8q + j] = (q*8+j)*Kw + l
    says which PLAYER-MAJOR key row (p*R + r = output position) each
    kernel slot must hold.  Kw = R/4 words."""
    Kw = (R * 8) // 32
    pos = np.arange(R * 8)
    qj, l = np.divmod(pos, Kw)
    perm = np.empty(R * 8, np.int64)
    perm[32 * l + 8 * (qj // 8) + (qj % 8)] = pos
    return perm


def aes_ctr_tape_z64_pallas(keys_pm, n_blocks: int, lane_mask_pm,
                            start_block=0, interpret: bool = False,
                            tile_b: int = 32):
    """Drop-in device equivalent of aes_jax.aes_ctr_tape_z64_chunked.

    keys_pm: (R*8, 16) u8 keys in PLAYER-MAJOR order (row p*R + r);
    lane_mask_pm: (R*8//32,) u32 in the same raw order
    (lane_mask_raw_pm).  Returns (lo, hi): (n_blocks*2, 8, R) u32."""
    K = keys_pm.shape[0]
    R = K // 8
    Kw = K // 32
    from .aes_jax import round_key_planes_device

    perm = z64emit_key_perm(R)
    keys_k = jnp.asarray(keys_pm)[perm]
    # permute mask bits: kernel bit slot s must carry raw mask bit perm[s]
    mbits = (jnp.asarray(lane_mask_pm)[:, None] >> jnp.arange(32, dtype=jnp.uint32)[None, :]) & jnp.uint32(1)
    mbits = mbits.reshape(-1)[perm].reshape(-1, 32)
    mask_k = jnp.sum(mbits << jnp.arange(32, dtype=jnp.uint32)[None, :],
                     axis=1, dtype=jnp.uint32)
    rkp = round_key_planes_device(keys_k)

    mask2d = mask_k.reshape(1, Kw)
    bpr = 128 // Kw if (Kw < 128 and 128 % Kw == 0) else 1
    if bpr > 1:
        rkp = jnp.concatenate([rkp] * bpr, axis=-1)
        mask2d = jnp.concatenate([mask2d] * bpr, axis=-1)
    L = Kw * bpr
    if tile_b % bpr:
        tile_b = max(bpr, (tile_b // bpr) * bpr)
    while tile_b > 8 * bpr and 2 * 128 * (tile_b // bpr) * L * 4 > 8 * 1024 * 1024:
        tile_b //= 2
    B = n_blocks
    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    grid = (Bp // tile_b,)
    T = tile_b // bpr
    out_shape = jax.ShapeDtypeStruct((Bp // bpr, bpr, 64, Kw), jnp.uint32)
    out_spec = pl.BlockSpec((T, bpr, 64, Kw), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    if bpr == 1:
        out_shape = jax.ShapeDtypeStruct((Bp, 64, Kw), jnp.uint32)
        out_spec = pl.BlockSpec((T, 64, Kw), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    lo, hi = pl.pallas_call(
        functools.partial(_aes_tape_z64_kernel, tile_b, bpr, not interpret),
        out_shape=(out_shape, out_shape),
        grid=grid,
        in_specs=[
            pl.BlockSpec((11, 16, 8, L), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        interpret=interpret,
        out_specs=(out_spec, out_spec),
    )(rkp, mask2d, jnp.asarray(start_block, jnp.int32).reshape(1))

    def _tail(x):
        # [t(,g), w*32+qj, l] -> (slots, 8, R): flat row = 2*block + w,
        # columns (q*8+j)*Kw + l = player-major p*R + r by construction
        return x.reshape(Bp * 2, 8, R)[: B * 2]

    return _tail(lo), _tail(hi)


def u8emit_byte_perm(R: int) -> np.ndarray:
    """Byte-slot permutation for the u8 relayout-kernel tape tail.

    u32_rows_to_u8_rows emits byte b of tape word k to output lane
    b*Kw + k (a lane concat of the four byte-plane truncations -- the
    only u32->u8 lane fan-out Mosaic compiles).  perm[4*k + b] = r says
    key byte-slot 4k+b (keys 32k+8b .. +8) must carry rep r's keys for
    the output to land in exact repetition order.  Callers permute the
    host key rows and mask bytes by this (aes_ctr_tape_gf2_pallas_u8);
    proof bytes are unchanged.  Independent of the AES kernel's bpr/kwt
    tiling: the permutation only touches which key occupies which u32
    word bits."""
    Kw = (R * 8) // 32
    reps = np.arange(R)
    b, k = np.divmod(reps, Kw)
    perm = np.empty(R, np.int32)
    perm[4 * k + b] = reps
    return perm


def aes_ctr_tape_gf2_pallas_u8(keys, n_blocks: int, lane_mask,
                               start_block=0, interpret: bool = False,
                               split: bool = False,
                               colsched: bool | None = None,
                               tile_b: int = 32, tile_kw: int = 64):
    """In-kernel u8 tape emission (round 5): byte-identical to
    aes_ctr_tape_gf2_pallas + its bitcast tail, but the kernel writes the
    executor-native u8 rows directly, so no XLA u32->u8 relayout exists
    anywhere (that relayout cost ~8-10 ms of the 1M prove's tape_execute
    phase whether materialized or fused into the executor's reads).

    keys: (R*8, 16) u8 seed-expanded player keys in repetition order;
    lane_mask: (R*8//32,) u32 in repetition order (lane_mask_from_omit).
    The key rows and mask bytes are permuted host/graph-side
    (u8emit_byte_perm) so the kernel's concat-order emission lands in
    exact repetition order."""
    from .aes_jax import round_key_planes_device

    R = keys.shape[0] // 8
    perm = u8emit_byte_perm(R)
    krp = (perm[:, None] * 8 + np.arange(8)[None, :]).reshape(-1)
    keys = jnp.asarray(keys)[krp]
    mb = jax.lax.bitcast_convert_type(jnp.asarray(lane_mask), jnp.uint8)
    mb = mb.reshape(-1)[perm]
    mask_p = jax.lax.bitcast_convert_type(mb.reshape(-1, 4), jnp.uint32)
    return aes_ctr_tape_gf2_pallas(
        round_key_planes_device(keys), n_blocks, mask_p,
        start_block=start_block, tile_b=tile_b, tile_kw=tile_kw,
        interpret=interpret, colsched=colsched, split=split, u8_out=True)


def pallas_rep_pad(R: int) -> int:
    """Smallest rep count >= R that the tape kernel tiles at full lane
    utilization: Kw = R/4 key-lanes must either pack into one 128-lane vreg
    (Kw in {16, 32, 64} via bpr key replication) or be 128-divisible.

    Callers pad the key batch with zero keys up to this count and slice the
    tape back to R columns -- this is how the verifier rep counts (R=40
    online -> 64, R=216 preprocessing -> 256) reach the fast kernel instead
    of falling back to the XLA path (reference expands every opened rep's
    tape with the same AES-NI code regardless of count, crypto/prg.rs:27-37).
    """
    if R % 256 == 0:
        return R
    for cand in (64, 128, 256):
        if R <= cand:
            return cand
    return ((R + 255) // 256) * 256
