"""Extractor path agreement (round-5 verdict item 6).

The gf2 extractor has two forms: a one-hot i8 MXU column select (gated to
R <= 512 -- at batch shapes the (R, K) one-hot is quadratic and halved
config-5 throughput in round 4) and a gather form for batch lane counts.
Both must produce identical bytes at single-proof AND batch shapes, and
the gate must route batch shapes to the gather form."""

import numpy as np
import pytest


def _mk(cc, R, seed=3):
    rng = np.random.RandomState(seed)
    onl2 = rng.randint(0, 256, size=(cc.onl2, R), dtype=np.uint8)
    pre2 = rng.randint(0, 256, size=(cc.pre2, R), dtype=np.uint8)
    return onl2, pre2


@pytest.mark.parametrize("R", [256, 768])
def test_gf2_extractor_paths_agree(R, monkeypatch):
    import jax.numpy as jnp

    from reverie_tpu.backend.tpu_host import TpuKKW, make_gf2_extractor
    from reverie_tpu.circuit.builders import mul_bench_circuit

    prog, _, _ = mul_bench_circuit(50)
    cc = TpuKKW(prog).cc
    onl2, pre2 = _mk(cc, R)
    K = 40 if R == 256 else 120
    rng = np.random.RandomState(7)
    cols = np.sort(rng.choice(R, size=K, replace=False)).astype(np.int32)
    shifts = rng.randint(0, 8, size=K).astype(np.uint8)

    monkeypatch.setenv("REVERIE_EXTRACT_MM", "1")
    mm = make_gf2_extractor(cc)
    monkeypatch.setenv("REVERIE_EXTRACT_MM", "0")
    gather = make_gf2_extractor(cc)

    args = (jnp.asarray(onl2), jnp.asarray(pre2), jnp.asarray(shifts),
            jnp.asarray(cols))
    a = np.asarray(mm(*args))
    b = np.asarray(gather(*args))
    # at R=768 the mm builder must itself route to the gather form
    # (the gate is inside fn on onl2.shape[1]), so both calls agree AND
    # the batch shape never pays the quadratic one-hot
    np.testing.assert_array_equal(a, b)


def test_z64_extractor_matches_numpy():
    """The round-5 MXU one-hot z64 extractor vs a direct numpy model of
    the opened-stream layout (z64/share.rs: 8 players x 8 bytes per
    event; the proof opens the omitted player's 8 bytes)."""
    import jax.numpy as jnp

    from reverie_tpu.backend.tpu_host import TpuKKW, make_z64_extractor
    from reverie_tpu.circuit.builders import z64_mul_bench_circuit

    prog, _, _ = z64_mul_bench_circuit(20)
    cc = TpuKKW(prog).cc
    R = 256
    rng = np.random.RandomState(11)
    onlz_rows = cc.onlz
    prez_rows = cc.prez
    onlz = rng.randint(0, 256, size=(onlz_rows, R), dtype=np.uint8)
    prez = rng.randint(0, 256, size=(prez_rows, R), dtype=np.uint8)
    K = 40
    cols = np.sort(rng.choice(R, size=K, replace=False)).astype(np.int32)
    omit = rng.randint(0, 8, size=K).astype(np.int32)

    fn = make_z64_extractor(cc)
    got = np.asarray(fn(jnp.asarray(onlz), jnp.asarray(prez),
                        jnp.asarray(omit), jnp.asarray(cols)))

    nr, nc, ni = (len(cc.recon_slotsz), len(cc.corr_slotsz),
                  len(cc.input_slotsz))
    want = []
    rec = np.stack([
        np.stack([onlz[cc.recon_slotsz[e] + omit[j] * 8:
                       cc.recon_slotsz[e] + omit[j] * 8 + 8, cols[j]]
                  for e in range(nr)])
        for j in range(K)])
    want.append(rec.reshape(-1))
    cor = np.stack([
        np.stack([prez[cc.corr_slotsz[e]:cc.corr_slotsz[e] + 8, cols[j]]
                  for e in range(nc)])
        for j in range(K)])
    want.append(cor.reshape(-1))
    if ni:
        inp = np.stack([
            np.stack([onlz[cc.input_slotsz[e]:cc.input_slotsz[e] + 8,
                           cols[j]] for e in range(ni)])
            for j in range(K)])
        want.append(inp.reshape(-1))
    np.testing.assert_array_equal(got, np.concatenate(want))
