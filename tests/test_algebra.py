"""Algebra pack/unpack round-trip property tests (reference
src/algebra/mod.rs:201-409) at many lengths including non-multiples of 8."""

import numpy as np
import pytest

from reverie_tpu.algebra import gf2, z64

LENGTHS = [1, 2, 3, 6, 18, 32, 64, 63, 65, 128, 127]


def rand_u64(rng, shape):
    return rng.randint(0, 2**64, size=shape, dtype=np.uint64)


@pytest.mark.parametrize("n", LENGTHS)
def test_gf2_recon_pack_roundtrip(n):
    rng = np.random.RandomState(n)
    # valid recon words: each rep byte 0x00/0xFF
    bits = rng.randint(0, 2, size=(n, 1, 8)).astype(np.uint8)
    recons = gf2.from_rep_bytes((bits * 0xFF).astype(np.uint8)).reshape(n, 1)
    selected = np.ones((1, 8), dtype=bool)
    packed = gf2.pack_recon(recons, selected)
    streams = [packed[(0, r)] for r in range(8)]
    # the reference always emits an extra remainder byte
    assert len(streams[0]) == n // 8 + 1
    back = gf2.unpack_recon(streams)
    assert back.shape[0] >= n
    assert np.array_equal(back[:n], recons[:, 0])


@pytest.mark.parametrize("n", LENGTHS)
def test_gf2_share_pack_selected_roundtrip(n):
    rng = np.random.RandomState(n + 100)
    shares = rand_u64(rng, (n, 1))
    omit = rng.randint(0, 8, size=(1, 8))
    selected = np.ones((1, 8), dtype=bool)
    packed = gf2.pack_selected_shares(shares, omit, selected)
    streams = [packed[(0, r)] for r in range(8)]
    back = gf2.unpack_selected_shares(streams, list(omit[0]))
    assert back.shape[0] >= n
    # only the omitted player's bit per rep survives the round-trip
    for r in range(8):
        p = int(omit[0, r])
        shift = np.uint64((7 - r) * 8 + (7 - p))
        want = (shares[:, 0] >> shift) & np.uint64(1)
        got = (back[:n] >> shift) & np.uint64(1)
        assert np.array_equal(got, want), (r, p)
        # all other bits zero
    mask = np.uint64(0)
    for r in range(8):
        p = int(omit[0, r])
        mask |= np.uint64(1) << np.uint64((7 - r) * 8 + (7 - p))
    assert np.all(back[:n] & ~mask == 0)


@pytest.mark.parametrize("n", LENGTHS)
def test_z64_recon_pack_roundtrip(n):
    rng = np.random.RandomState(n + 7)
    recons = rand_u64(rng, (n, 1, 8))
    selected = np.ones((1, 8), dtype=bool)
    packed = z64.pack_recon(recons, selected)
    streams = [packed[(0, r)] for r in range(8)]
    assert len(streams[0]) == 8 * n
    back = z64.unpack_recon(streams)
    assert np.array_equal(back, recons[:, 0])


@pytest.mark.parametrize("n", LENGTHS)
def test_z64_share_pack_selected_roundtrip(n):
    rng = np.random.RandomState(n + 13)
    shares = rand_u64(rng, (n, 1, 8, 8))
    omit = rng.randint(0, 8, size=(1, 8))
    selected = np.ones((1, 8), dtype=bool)
    packed = z64.pack_selected_shares(shares, omit, selected)
    streams = [packed[(0, r)] for r in range(8)]
    back = z64.unpack_selected_shares(streams, list(omit[0]))
    for r in range(8):
        p = int(omit[0, r])
        assert np.array_equal(back[:, r, p], shares[:, 0, r, p])
    # non-selected coordinates are zero
    for r in range(8):
        for p in range(8):
            if p != int(omit[0, r]):
                assert np.all(back[:, r, p] == 0)


def test_gf2_reconstruct_parity():
    rng = np.random.RandomState(0)
    shares = rand_u64(rng, (100,))
    rec = gf2.reconstruct(shares)
    by = gf2.rep_bytes(shares)
    want_bits = np.bitwise_xor.reduce(np.unpackbits(by, axis=-1).reshape(100, 8, 8), axis=2)
    got = (gf2.rep_bytes(rec) & 1).astype(np.uint8)
    assert np.array_equal(got, want_bits)
    # recon bytes are 0x00/0xFF
    rb = gf2.rep_bytes(rec)
    assert np.all((rb == 0) | (rb == 0xFF))


def test_z64_reconstruct_wrapping_sum():
    rng = np.random.RandomState(1)
    shares = rand_u64(rng, (50, 4, 8))
    rec = z64.reconstruct(shares)
    want = shares.sum(axis=-1, dtype=np.uint64)
    assert np.array_equal(rec, want)
