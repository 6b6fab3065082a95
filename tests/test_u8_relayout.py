"""Unit coverage for the round-5 relayout machinery (off-hardware).

The HW byte-exactness of the full kernels is checked by
tools/r5_u8tape.py and the golden battery; these tests pin the pieces
that are pure math -- the byte-slot permutations, the relayout kernel in
interpret mode, and the SWAR transposes the z64 kernel builds on
(numpy-validated in tools/r5_zswar.py, committed here so a regression is
loud in CI)."""

import numpy as np
import pytest

U = np.uint32


def test_u8emit_byte_perm_roundtrip():
    """Feeding keys permuted by u8emit_byte_perm through byte-plane-concat
    emission must reproduce the exact-rep-order bitcast layout."""
    from reverie_tpu.crypto.kernels.aes_pallas import u8emit_byte_perm

    for R in (64, 256, 512, 768):
        Kw = R // 4
        perm = u8emit_byte_perm(R)
        # kernel word k packs key byte-groups perm[4k+b] at byte b; the
        # concat emission puts byte b of word k at output lane b*Kw + k
        out = np.empty(R, np.int64)
        for k in range(Kw):
            for b in range(4):
                out[b * Kw + k] = perm[4 * k + b]
        # output lane c must hold rep c
        np.testing.assert_array_equal(out, np.arange(R))


def test_u32_rows_to_u8_rows_interpret():
    from reverie_tpu.crypto.kernels.aes_pallas import u32_rows_to_u8_rows

    rng = np.random.RandomState(3)
    w = rng.randint(0, 2**31, size=(512, 16), dtype=np.uint32)
    got = np.asarray(u32_rows_to_u8_rows(w, interpret=True))
    by = w.view(np.uint8).reshape(512, 16, 4)  # [row, word, byte] LE
    want = np.concatenate([by[:, :, b] for b in range(4)], axis=1)
    np.testing.assert_array_equal(got, want)


def test_z64emit_key_perm_roundtrip():
    from reverie_tpu.crypto.kernels.aes_pallas import z64emit_key_perm

    for R in (64, 256):
        Kw = R // 4
        perm = z64emit_key_perm(R)
        # kernel key slot 32l + 8q + j emits to output position
        # (q*8 + j)*Kw + l; the permuted feed must make position p hold
        # player-major key row p
        out = np.empty(R * 8, np.int64)
        for l in range(Kw):
            for q in range(4):
                for j in range(8):
                    out[(q * 8 + j) * Kw + l] = perm[32 * l + 8 * q + j]
        np.testing.assert_array_equal(out, np.arange(R * 8))


def _transpose_bits_8x8(w):
    w = [x.copy() for x in w]
    for dm, pairs, m in (
        (4, (0, 1, 2, 3), U(0x0F0F0F0F)),
        (2, (0, 1, 4, 5), U(0x33333333)),
        (1, (0, 2, 4, 6), U(0x55555555)),
    ):
        sh = U(dm)
        for b in pairs:
            x, y = w[b], w[b + dm]
            w[b] = (x & m) | ((y & m) << sh)
            w[b + dm] = ((x >> sh) & m) | (y & ~m)
    return w


def _transpose_bytes_4x4(a):
    m = U(0x0000FFFF)
    b0 = (a[0] & m) | ((a[2] & m) << U(16))
    b2 = ((a[0] >> U(16)) & m) | (a[2] & ~m)
    b1 = (a[1] & m) | ((a[3] & m) << U(16))
    b3 = ((a[1] >> U(16)) & m) | (a[3] & ~m)
    m = U(0x00FF00FF)
    return [
        (b0 & m) | ((b1 & m) << U(8)),
        ((b0 >> U(8)) & m) | (b1 & ~m),
        (b2 & m) | ((b3 & m) << U(8)),
        ((b2 >> U(8)) & m) | (b3 & ~m),
    ]


def test_swar_bit_transpose_8x32():
    """The z64 kernel's stage-1 transpose: 8 bit-plane words -> per-key
    bytes, t[j] byte-lane q = key 8q+j (mirrors the in-kernel code)."""
    rng = np.random.RandomState(0)
    keybytes = rng.randint(0, 256, 32).astype(np.uint8)
    w = []
    for b in range(8):
        word = U(0)
        for k in range(32):
            word |= U(((int(keybytes[k]) >> b) & 1)) << U(k)
        w.append(np.array([word], U))
    t = _transpose_bits_8x8(w)
    for j in range(8):
        for q in range(4):
            got = (int(t[j][0]) >> (8 * q)) & 0xFF
            assert got == keybytes[8 * q + j], (j, q)


def test_swar_byte_transpose_4x4():
    rng = np.random.RandomState(1)
    ab = rng.randint(0, 256, (4, 4)).astype(np.uint8)
    a = []
    for i in range(4):
        word = U(0)
        for q in range(4):
            word |= U(int(ab[i][q])) << U(8 * q)
        a.append(np.array([word], U))
    o = _transpose_bytes_4x4(a)
    for q in range(4):
        for i in range(4):
            assert ((int(o[q][0]) >> (8 * i)) & 0xFF) == int(ab[i][q])


@pytest.mark.slow
def test_z64_tape_pallas_interpret_tiny():
    """The full z64 Pallas kernel in interpret mode vs the XLA reference
    path at a tiny shape (covers the in-kernel transposes + permutations
    off-hardware; HW byte-exactness at production shapes is in the golden
    battery).  Slow tier: interpret-mode AES takes ~3 min on CPU."""
    import jax
    import jax.numpy as jnp

    from reverie_tpu.crypto.kernels import aes_jax as aj
    from reverie_tpu.crypto.kernels.aes_pallas import aes_ctr_tape_z64_pallas

    rng = np.random.RandomState(5)
    R, B = 64, 8
    keys = rng.randint(0, 256, size=(R * 8, 16), dtype=np.uint8)
    omit = rng.randint(0, 9, size=(R,)).astype(np.uint8)
    mask = aj.lane_mask_raw_pm(omit, R)
    want = jax.jit(lambda k, m: aj.aes_ctr_tape_z64_chunked(
        aj.round_key_planes_device(k), aj.counter_planes_device(B), m))(
        jnp.asarray(keys), jnp.asarray(mask))
    got = aes_ctr_tape_z64_pallas(jnp.asarray(keys), B, jnp.asarray(mask),
                                  interpret=True)
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(want[i]),
                                      np.asarray(got[i]))


def test_compile_program_disk_cache(tmp_path, monkeypatch):
    """The levelizer disk cache must round-trip CompiledCircuit exactly:
    proofs built from a cache-loaded circuit are byte-identical."""
    monkeypatch.setenv("REVERIE_COMPILE_CACHE", str(tmp_path))
    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.circuit.builders import mul_bench_circuit
    from reverie_tpu.circuit.compile import compile_program

    prog, w2, wz = mul_bench_circuit(40)
    seeds = (np.arange(256 * 16, dtype=np.uint8).reshape(256, 16) % 251)
    cc_cold = compile_program(prog, cache_key=b"test:mul40")
    assert any(p.suffix == ".pkl" for p in tmp_path.iterdir())
    cc_warm = compile_program(prog, cache_key=b"test:mul40")
    p1 = TpuKKW(prog, cc=cc_cold).prove(w2, wz, seeds=seeds)
    p2 = TpuKKW(prog, cc=cc_warm).prove(w2, wz, seeds=seeds)
    assert p1.to_bytes() == p2.to_bytes()
    assert TpuKKW(prog, cc=cc_warm).verify(p2)
