"""Pallas AES kernel coverage on CPU via interpret mode.

The Pallas TPU kernel (crypto/kernels/aes_pallas.py) is differentially
tested against the host AES-CTR golden (native C, KAT-validated) on every
CPU test run, so the kernel's math is exercised without TPU hardware
(hardware execution is separately validated by tools/tpu_check.py).
"""

import os

import numpy as np
import pytest

from reverie_tpu.backend.tpu_host import build_tapes
from reverie_tpu.crypto import expand_seeds
from reverie_tpu.crypto.kernels import aes_jax as aj
from reverie_tpu.crypto.kernels.aes_pallas import (
    aes_ctr_planes_pallas,
    aes_ctr_tape_gf2_pallas,
)


def _keys(R: int) -> np.ndarray:
    rng = np.random.RandomState(7)
    seeds = rng.randint(0, 256, size=(R, 16), dtype=np.uint8)
    return expand_seeds(seeds).reshape(R, 8, 16)


@pytest.mark.parametrize(
    "n_blocks,R",
    [
        pytest.param(16, 32, marks=pytest.mark.slow),
        pytest.param(24, 32, marks=pytest.mark.slow),
        # Kw=16 -> bpr=8 covered by test_pallas_tape_rep_padding_contract in
        # the default tier (it additionally checks the zero-key pad contract)
        pytest.param(16, 64, marks=pytest.mark.slow),
        (8, 128),   # Kw=32 -> bpr=4 (padded preprocessing count via 128-lane)
        (32, 256),
    ],
)
def test_pallas_tape_matches_host_golden(n_blocks, R):
    # R=32 -> Kw=8 (bpr=16 lane packing); R=64/128 -> bpr=8/4 (the lane
    # configs pallas_rep_pad routes verifier rep counts onto); R=256 ->
    # Kw=64 (bpr=2, the single-proof headline shape)
    pk = _keys(R)
    rkp = aj.round_key_planes(pk.reshape(-1, 16))
    mask = np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32)
    m2 = n_blocks * 128
    golden, _, _ = build_tapes(pk, None, m2, 0)  # (m2, R)
    tape = np.asarray(
        aes_ctr_tape_gf2_pallas(rkp, n_blocks, mask, tile_b=16, interpret=True)
    )[:m2]
    np.testing.assert_array_equal(tape, golden)


def test_pallas_tape_split_planes_match_host_golden():
    """split=True emits even/odd slot planes (slot s -> plane s & 1, row
    s >> 1) byte-identical to the interleaved tape (Executor.take_tape reads
    this layout; routing is in-kernel, backend-layout-only -- proof bytes
    unchanged).  Covers the bpr=2 production lane config and a bpr=4 one."""
    for n_blocks, R in ((8, 128), (16, 256)):
        pk = _keys(R)
        rkp = aj.round_key_planes(pk.reshape(-1, 16))
        mask = np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32)
        m2 = n_blocks * 128
        golden, _, _ = build_tapes(pk, None, m2, 0)
        e, o = aes_ctr_tape_gf2_pallas(rkp, n_blocks, mask, tile_b=16,
                                       interpret=True, split=True)
        np.testing.assert_array_equal(np.asarray(e)[: (m2 + 1) // 2],
                                      golden[0::2])
        np.testing.assert_array_equal(np.asarray(o)[: m2 // 2], golden[1::2])


def test_pallas_tape_rep_padding_contract():
    """The verifier rep-count path (tpu_host._gf2_tape): keys zero-padded to
    pallas_rep_pad(R) lanes, kernel run at the padded count, tape sliced back
    to R columns -- must equal the host golden at the UNpadded R (R=40 is the
    online-verify count, padding to 64 -> bpr=8 de-interleave)."""
    from reverie_tpu.crypto.kernels.aes_pallas import pallas_rep_pad

    R = 40
    R_pad = pallas_rep_pad(R)
    assert R_pad == 64
    pk = _keys(R)
    keys = pk.reshape(-1, 16)
    keys_p = np.concatenate(
        [keys, np.zeros(((R_pad - R) * 8, 16), np.uint8)]
    )
    rkp = aj.round_key_planes(keys_p)
    mask = np.concatenate(
        [np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32),
         np.zeros((R_pad - R) * 8 // 32, np.uint32)]
    )
    m2 = 8 * 128
    golden, _, _ = build_tapes(pk, None, m2, 0)  # (m2, R)
    tape = np.asarray(
        aes_ctr_tape_gf2_pallas(rkp, 8, mask, tile_b=8, interpret=True)
    )[:m2, :R]
    np.testing.assert_array_equal(tape, golden)


@pytest.mark.slow
def test_pallas_tape_start_block_windows():
    """start_block windows the CTR: the kernel's rows [0, m2s) at
    start_block=b0 must equal the whole tape's rows [b0*128, ...)
    (streaming-segment tape windows, backend/streaming.py)."""
    R = 32
    pk = _keys(R)
    rkp = aj.round_key_planes(pk.reshape(-1, 16))
    mask = np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32)
    golden, _, _ = build_tapes(pk, None, 48 * 128, 0)  # (m2, R)
    for b0, nb in [(16, 16), (24, 24)]:
        tape = np.asarray(
            aes_ctr_tape_gf2_pallas(
                rkp, nb, mask, start_block=np.int32(b0), tile_b=16,
                interpret=True,
            )
        )
        np.testing.assert_array_equal(tape, golden[b0 * 128 : (b0 + nb) * 128])


@pytest.mark.slow
def test_pallas_tape_lane_mask_omits_players():
    R = 32
    pk = _keys(R)
    rkp = aj.round_key_planes(pk.reshape(-1, 16))
    omit = np.arange(R) % 9  # player 0..7 plus "none" (8)
    mask = aj.lane_mask_from_omit(omit, R)
    m2 = 16 * 128
    golden, _, _ = build_tapes(pk, omit, m2, 0)
    tape = np.asarray(
        aes_ctr_tape_gf2_pallas(rkp, 16, mask, tile_b=16, interpret=True)
    )[:m2]
    np.testing.assert_array_equal(tape, golden)


@pytest.mark.skipif(
    not os.environ.get("REVERIE_TEST_COLSCHED"),
    reason="9-round-unrolled interpret graph exceeds 30 min of XLA:CPU "
           "compile; byte-exactness is HW-validated (tools/r4_hw1.py aes)",
)
@pytest.mark.slow
def test_pallas_tape_colsched_matches_host_golden():
    """The column-scheduled round body (REVERIE_AES_COLSCHED) is a pure
    reordering of the standard body; byte-exact vs the host golden."""
    R = 32
    pk = _keys(R)
    rkp = aj.round_key_planes(pk.reshape(-1, 16))
    mask = np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32)
    m2 = 8 * 128
    golden, _, _ = build_tapes(pk, None, m2, 0)
    tape = np.asarray(
        aes_ctr_tape_gf2_pallas(rkp, 8, mask, tile_b=8, interpret=True,
                                colsched=True)
    )[:m2]
    np.testing.assert_array_equal(tape, golden)


def test_pallas_planes_match_xla_kernel_tape():
    """Planes kernel + the XLA post-processing path agree with aes_jax."""
    R = 32
    pk = _keys(R)
    rkp = aj.round_key_planes(pk.reshape(-1, 16))
    mask = np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32)
    B = 16
    ctrp = aj.counter_planes(B)
    ref = np.asarray(aj.aes_ctr_tape_gf2(rkp, ctrp, mask))
    planes = np.asarray(aes_ctr_planes_pallas(rkp, B, tile_b=16, interpret=True))
    # replicate the post-processing in NumPy
    words = np.transpose(planes[:, ::-1], (2, 0, 1, 3)).reshape(B * 128, -1)
    m1, m2_, m4 = np.uint32(0x55555555), np.uint32(0x33333333), np.uint32(0x0F0F0F0F)
    words = ((words & m1) << np.uint32(1)) | ((words >> np.uint32(1)) & m1)
    words = ((words & m2_) << np.uint32(2)) | ((words >> np.uint32(2)) & m2_)
    words = ((words & m4) << np.uint32(4)) | ((words >> np.uint32(4)) & m4)
    got = np.ascontiguousarray(words).view(np.uint8).reshape(B * 128, -1)
    np.testing.assert_array_equal(got, ref)


def test_z64_chunked_tape_matches_unchunked():
    """aes_ctr_tape_z64_chunked (lax.scan over block chunks, used for large
    mz where the monolithic kernel breaks the compile) must be bit-identical
    to the unchunked kernel and the host golden."""
    import jax.numpy as jnp

    R = 32
    pk = _keys(R)
    # player-major key order: the z64 tape contract (aes_ctr_tape_z64)
    rkp = jnp.asarray(aj.round_key_planes(
        np.ascontiguousarray(pk.transpose(1, 0, 2)).reshape(-1, 16)))
    mask = jnp.asarray(np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32))
    mz = 600  # -> B = 320 blocks; chunk_b=64 exercises padding + multi-chunk
    nbytes = ((mz + 127) // 128) * 1024
    B = nbytes // 16
    ctrp = jnp.asarray(aj.counter_planes(B))
    lo_u, hi_u = aj.aes_ctr_tape_z64(rkp, ctrp, mask)
    lo_c, hi_c = aj.aes_ctr_tape_z64_chunked(rkp, ctrp, mask, chunk_b=64)
    np.testing.assert_array_equal(np.asarray(lo_c), np.asarray(lo_u))
    np.testing.assert_array_equal(np.asarray(hi_c), np.asarray(hi_u))
    _, glo, ghi = build_tapes(pk, None, 0, mz)
    np.testing.assert_array_equal(np.asarray(lo_c)[:mz], glo)
    np.testing.assert_array_equal(np.asarray(hi_c)[:mz], ghi)


@pytest.mark.parametrize(
    "n,R,base,transpose",
    [
        (8, 128, 0, True),          # exact tile
        (5, 128, 3, True),          # boundary block (n % tile_c != 0)
        (5, 128, 3, False),         # no-corner-turn kernel variant
        (9, 256, 123456, True),     # multi-lane-tile grid + big counter base
        pytest.param(3, 40, 1, True, marks=pytest.mark.slow),  # lane-padded R
    ],
)
def test_pallas_blake3_from_bytes_matches_xla(n, R, base, transpose):
    """chunk_cvs_from_bytes (sublane-bitcast word load + register-resident
    compress, interpret mode) must match the XLA indexed-scan chunk CVs,
    including a nonzero global counter base (streaming absorb), boundary
    blocks, and lane-padded rep counts."""
    import jax.numpy as jnp

    from reverie_tpu.crypto.kernels import blake3_jax as bj
    from reverie_tpu.crypto.kernels.blake3_pallas import chunk_cvs_from_bytes

    rng = np.random.RandomState(3)
    buf = rng.randint(0, 256, size=(n * 1024 + 37, R), dtype=np.uint8)
    words = bj._bytes_to_words(jnp.asarray(buf[: n * 1024])).reshape(
        n, 16, 16, R
    )
    x0, x1 = bj._chunk_cvs_indexed(words, base)
    p0, p1 = chunk_cvs_from_bytes(
        jnp.asarray(buf), n, base, transpose=transpose, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(x0))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(x1))
