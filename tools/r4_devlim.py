"""Round-4 authoritative device-limited profile (chained-slope method).

The round-3 per-phase numbers (BASELINE.md, bench._device_limited_bench)
fenced every phase with a host pull and subtracted a "pull" calibration that
re-pulled an ALREADY-materialized array -- so each phase silently included
one full axon relay roundtrip (~27 ms measured on this rig,
tools/r4_hw1.py-era method).  That inflation is exactly the 2x contradiction
the round-3 verdict flagged (5-6 vs 10-13 M gates/s).

Method here: each phase is wrapped in a jitted step fn chained on a u32
scalar (the scalar perturbs one input byte-plane, the output checksum feeds
the next iteration), run K=2 and K=8 back-to-back with ONE pull at the end:

    per-iter device time = (T(K=8) - T(K=2)) / 6

The subtraction cancels the relay RTT and the one-time ramp; chaining defeats
reordering; the checksum (full u32 sum of every output) defeats DCE and adds
one documented read pass per phase (~1 ms at 512 MB).  A trivial-op slope is
reported alongside as the dispatch floor.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

U32 = jnp.uint32
R = 256


def _ck(*arrs):
    tot = jnp.uint32(0)
    for a in arrs:
        tot = tot + jnp.sum(a.astype(U32), dtype=U32)
    return tot


def slope(step, s0, k_lo=2, k_hi=8, reps=3):
    """Per-iteration seconds of `step` (chained scalar), RTT-cancelled."""
    s = step(s0)
    float(np.asarray(s))  # warm compile + one full run

    def run(k):
        s = step(s0 + jnp.uint32(1))
        float(np.asarray(s))  # fence the ramp call; RTT cancels in the slope
        t0 = time.time()
        for _ in range(k):
            s = step(s)
        float(np.asarray(s))
        return time.time() - t0

    best = min(
        (run(k_hi) - run(k_lo)) / (k_hi - k_lo) for _ in range(reps)
    )
    return best


def main(n_gates=1_000_000):
    from reverie_tpu.backend.tpu_host import TpuKKW, PROVER, expand_seeds
    from reverie_tpu.backend.tpu_host import make_gf2_extractor
    from reverie_tpu.circuit.builders import mul_bench_circuit
    from reverie_tpu.crypto.kernels import aes_jax as aj
    from reverie_tpu.crypto.kernels.aes_pallas import aes_ctr_tape_gf2_pallas
    from reverie_tpu.params import DEFAULT_PARAMS

    print(f"devices: {jax.devices()}", flush=True)
    prog, wit2, witz = mul_bench_circuit(n_gates)
    sys_ = TpuKKW(prog)
    cc = sys_.cc
    rng = np.random.default_rng(11)
    seeds = rng.integers(0, 256, (R, 16), dtype=np.uint8)
    pk = expand_seeds(seeds).reshape(-1, 16)
    keys_d = jnp.asarray(pk)
    mask_d = jnp.asarray(np.full(pk.shape[0] // 32, 0xFFFFFFFF, np.uint32))
    nblocks = (((cc.m2 + 127) // 128) * 16) // 16
    w2 = np.asarray([1 if b else 0 for b in wit2], np.uint8)
    wit2_d = jnp.asarray(np.repeat(w2[: cc.n_wit2, None], R, axis=1))
    zrow = jnp.zeros((0, 8, R), jnp.uint32)
    zwit = jnp.zeros((0, R), jnp.uint32)

    # dispatch floor
    triv = jax.jit(lambda s: s + jnp.uint32(1))
    d_triv = slope(triv, jnp.uint32(0), 2, 18)
    print(f"dispatch floor (trivial op): {d_triv*1e3:.2f} ms/call", flush=True)

    # --- tape --- (split-plane emit when production uses it).  The tape jit
    # materializes its outputs at the jit boundary; the chain scalar comes
    # from a TINY fold so the measurement does not add a full checksum read
    # pass the production prove never pays (the in-jit _ck form overstated
    # the phase by ~2 ms at 1M).
    _split = sys_._use_tape_split

    @jax.jit
    def tape_jit(s):
        k = keys_d ^ (s & jnp.uint32(0xFF)).astype(jnp.uint8)
        return aes_ctr_tape_gf2_pallas(
            aj.round_key_planes_device(k), nblocks, mask_d, split=_split
        )

    tfold = jax.jit(
        lambda t: (t[0].reshape(-1)[0].astype(U32)
                   + t[1].reshape(-1)[0].astype(U32)) if _split
        else t.reshape(-1)[0].astype(U32))

    def tape_step(s):
        return tfold(tape_jit(s))

    d_tape = slope(tape_step, jnp.uint32(0))
    print(f"tape:    {d_tape*1e3:7.1f} ms", flush=True)

    # --- execute / hash / extract: the production inner jits are too large
    # to inline into one outer jit on the axon remote-compile endpoint
    # (HTTP 413), so these chain at the host level: a donated 1-element
    # perturb jit feeds the phase, a 1-element fold jit carries the chain
    # scalar, and nothing is pulled until the run's end.  The jit boundary
    # already forces full materialization of every phase output, so the tiny
    # fold cannot DCE phase work; the perturb/fold dispatches cost the
    # ~0.16 ms floor each.
    tape2 = sys_._gf2_tape(pk.reshape(R, 8, 16), None,
                           split=sys_._use_tape_split)
    ex = sys_._executor(PROVER, R)

    perturb = jax.jit(
        lambda w, s: w.at[0, 0].set((s & jnp.uint32(1)).astype(jnp.uint8)),
        donate_argnums=0,
    )
    fold = jax.jit(lambda a: a.reshape(-1)[0].astype(U32))

    def host_slope(step, state0, k_lo=2, k_hi=8, reps=3):
        s, st = step(jnp.uint32(0), state0)
        float(np.asarray(s))

        def run(k):
            nonlocal st
            s, st2 = step(jnp.uint32(1), st)
            float(np.asarray(s))
            st = st2
            t0 = time.time()
            for _ in range(k):
                s, st = step(s, st)
            float(np.asarray(s))
            return time.time() - t0

        return min((run(k_hi) - run(k_lo)) / (k_hi - k_lo) for _ in range(reps))

    def exec_step(s, w):
        w = perturb(w, s)
        out = ex(dict(tapez_lo=zrow, tapez_hi=zrow, wit2=w,
                      **sys_._tape2_inp(tape2),
                      witz_lo=zwit, witz_hi=zwit))
        return fold(out["onl2"]), w

    d_exec = host_slope(exec_step, wit2_d)
    print(f"execute: {d_exec*1e3:7.1f} ms", flush=True)

    # --- hash ---
    out0 = dict(ex(dict(tapez_lo=zrow, tapez_hi=zrow,
                        **sys_._tape2_inp(tape2),
                        wit2=jnp.asarray(np.repeat(w2[: cc.n_wit2, None], R,
                                                   axis=1)),
                        witz_lo=zwit, witz_hi=zwit)))
    hfn = sys_._hash_fn(False)

    def hash_step(s, o):
        o = perturb(o, s)
        rep_h, ho2, hoz = hfn(o, out0["pre2"], out0["onlz"], out0["prez"])
        return fold(rep_h), o

    d_hash = host_slope(hash_step, jnp.array(out0["onl2"]))
    print(f"hash:    {d_hash*1e3:7.1f} ms", flush=True)

    # --- extract --- (fixed challenge shape: K opened reps)
    from reverie_tpu.proof.challenge import challenge_to_opening
    from reverie_tpu.crypto.hashing import blake3

    buf = np.asarray(sys_._pull_hash_fail()(
        *hfn(out0["onl2"], out0["pre2"], out0["onlz"], out0["prez"])[0:1],
        out0["fail"],
    ))
    comm = blake3(buf[: R * 32].tobytes())
    omit = np.full(R, 8, dtype=np.int64)
    for rep, p in challenge_to_opening(comm, DEFAULT_PARAMS).items():
        omit[rep] = p
    cols = np.nonzero(omit < 8)[0]
    extractor = make_gf2_extractor(cc)
    sh_d = jnp.asarray((7 - omit[cols]).astype(np.uint8))
    cols_d = jnp.asarray(cols.astype(np.int32))

    def extract_step(s, o):
        o = perturb(o, s)
        g = extractor(o, out0["pre2"], sh_d, cols_d)
        return fold(g), o

    d_ext = host_slope(extract_step, jnp.array(out0["onl2"]))
    print(f"extract: {d_ext*1e3:7.1f} ms", flush=True)

    total = d_tape + d_exec + d_hash + d_ext
    print(f"total device: {total*1e3:.1f} ms -> "
          f"{n_gates/total/1e6:.1f} M gates/s device-limited", flush=True)
    print(f"(dispatch floor {d_triv*1e3:.2f} ms/call already cancelled by "
          f"the slope; checksum adds ~1 read pass/phase)", flush=True)


def main_z64(n_muls=50_000):
    """Slope-method device profile of the z64 executor (verdict item #5:
    player-major share-event emission; bar >=300k mul gates/s device)."""
    from reverie_tpu.backend.tpu_host import TpuKKW, PROVER, expand_seeds
    from reverie_tpu.circuit.builders import z64_mul_bench_circuit

    print(f"devices: {jax.devices()}", flush=True)
    prog, w2, wz = z64_mul_bench_circuit(n_muls)
    sys_ = TpuKKW(prog)
    cc = sys_.cc
    rng = np.random.default_rng(3)
    seeds = rng.integers(0, 256, (R, 16), dtype=np.uint8)
    pk = expand_seeds(seeds).reshape(R, 8, 16)
    tape2 = sys_._gf2_tape(pk, None, split=sys_._use_tape_split)
    tzlo, tzhi = sys_._z64_tape(pk, None)
    wlo = np.asarray([w & 0xFFFFFFFF for w in wz], np.uint32)
    whi = np.asarray([(w >> 32) & 0xFFFFFFFF for w in wz], np.uint32)
    wit2_d = jnp.asarray(
        np.repeat(np.zeros((cc.n_wit2, 1), np.uint8), R, axis=1))
    wlo_d = jnp.asarray(np.repeat(wlo[: cc.n_witz, None], R, axis=1))
    whi_d = jnp.asarray(np.repeat(whi[: cc.n_witz, None], R, axis=1))
    ex = sys_._executor(PROVER, R)

    perturb = jax.jit(
        lambda w, s: w.at[0, 0].set(s & jnp.uint32(1)), donate_argnums=0)
    fold = jax.jit(lambda a: a.reshape(-1)[0].astype(U32))

    def host_slope(step, state0, k_lo=2, k_hi=8, reps=3):
        s, st = step(jnp.uint32(0), state0)
        float(np.asarray(s))

        def run(k):
            nonlocal st
            s, st2 = step(jnp.uint32(1), st)
            float(np.asarray(s))
            st = st2
            t0 = time.time()
            for _ in range(k):
                s, st = step(s, st)
            float(np.asarray(s))
            return time.time() - t0

        return min((run(k_hi) - run(k_lo)) / (k_hi - k_lo) for _ in range(reps))

    def exec_step(s, w):
        w = perturb(w, s)
        out = ex(dict(tapez_lo=tzlo, tapez_hi=tzhi, wit2=wit2_d,
                      **sys_._tape2_inp(tape2),
                      witz_lo=w, witz_hi=whi_d))
        return fold(out["onlz"]), w

    d_exec = host_slope(exec_step, wlo_d)
    print(f"z64 execute: {d_exec*1e3:.1f} ms -> "
          f"{n_muls/d_exec/1e3:.0f}k mul gates/s device", flush=True)

    # tape + hash for the full device picture
    def hash_step(s, o):
        o = perturb(o, s)
        out0_ = ex(dict(tapez_lo=tzlo, tapez_hi=tzhi,
                        **sys_._tape2_inp(tape2),
                        wit2=wit2_d, witz_lo=o, witz_hi=whi_d))
        return fold(out0_["onlz"]), o

    _ = hash_step  # hash dominated by onlz streams; covered by gf2 main


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "z64":
        main_z64(int(sys.argv[2]) if len(sys.argv) > 2 else 50_000)
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
