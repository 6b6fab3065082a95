"""Host-pull-fenced phase profile of the 1M-AND single prove.

REVERIE_PROFILE's per-phase block_until_ready does not reliably block on the
axon relay (round-3 finding, tools/r3_exec_ablate.py), so phase attribution
in BASELINE.md's roofline may be shifted.  This tool re-measures each device
phase by pulling ONE element of the phase output to host (a ~pull-latency
fence), subtracting the measured pull latency, over varied seeds.
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from reverie_tpu.backend.tpu_host import TpuKKW, expand_seeds, PROVER
from reverie_tpu.circuit.builders import mul_bench_circuit
from reverie_tpu.params import DEFAULT_PARAMS

N = 1_000_000




def fence(x):
    return float(np.asarray(x).reshape(-1)[0])


def main():
    print(f"devices: {jax.devices()}", flush=True)
    prog, wit2l, witzl = mul_bench_circuit(N)
    sys_ = TpuKKW(prog)
    R = DEFAULT_PARAMS.total_reps
    

    rng = np.random.default_rng(7)

    # pull-latency baseline
    import jax.numpy as jnp
    small = jax.jit(lambda s: (s + 1))(jnp.uint32(3))
    fence(small)
    lats = []
    for _ in range(5):
        t0 = time.time(); fence(small); lats.append(time.time() - t0)
    pull = min(lats)
    print(f"pull latency ~{pull*1e3:.1f} ms", flush=True)

    for it in range(3):
        seeds = rng.integers(0, 256, (R, 16), dtype=np.uint8)
        t = {}
        t0 = time.time()
        player_keys = expand_seeds(seeds).reshape(R, 8, 16)
        t["expand(host)"] = time.time() - t0

        t0 = time.time()
        tape2 = sys_._gf2_tape(player_keys, None)
        fence(tape2[:1, :1])
        t["tape_gf2"] = time.time() - t0 - pull

        cc = sys_.cc
        wit2 = np.asarray([1, 1], dtype=np.uint8)
        bc = jax.jit(lambda w, r: jnp.repeat(w, r, axis=1), static_argnums=(1,))
        inp = dict(
            tape2=tape2,
            tapez_lo=np.zeros((0, 8, R), np.uint32),
            tapez_hi=np.zeros((0, 8, R), np.uint32),
            wit2=bc(wit2[: cc.n_wit2, None], R),
            witz_lo=bc(np.zeros(0, np.uint32)[:, None], R),
            witz_hi=bc(np.zeros(0, np.uint32)[:, None], R),
        )
        t0 = time.time()
        out = sys_._executor(PROVER, R)(inp)
        fence(out["onl2"][:1, :1])
        t["execute"] = time.time() - t0 - pull

        t0 = time.time()
        rep_h, ho2, hoz = sys_._hash_fn(False)(
            out["onl2"], out["pre2"], out["onlz"], out["prez"]
        )
        fence(rep_h[:1, :1])
        t["hash"] = time.time() - t0 - pull

        t0 = time.time()
        dbuf = sys_._pull_hash_fail()(rep_h, out["fail"], ho2, hoz)
        buf = np.asarray(dbuf)
        t["hash_pull(103KB)"] = time.time() - t0

        from reverie_tpu.proof.challenge import challenge_to_opening
        from reverie_tpu.crypto.hashing import blake3

        comm = blake3(buf[: R * 32].tobytes())
        open_map = challenge_to_opening(comm, DEFAULT_PARAMS)
        omit = np.full(R, 8, dtype=np.int64)
        for rep, p in open_map.items():
            omit[rep] = p
        cols = np.nonzero(omit < 8)[0]

        t0 = time.time()
        g2buf = sys_._extract_gf2_dispatch(out, cols, omit[cols])
        fence(g2buf[:1])
        t["extract_dev"] = time.time() - t0 - pull

        t0 = time.time()
        g2 = np.asarray(g2buf)
        t["extract_pull"] = time.time() - t0
        tot = sum(t.values())
        print(f"iter {it}: " + "  ".join(f"{k}={v*1e3:7.1f}ms" for k, v in t.items())
              + f"  TOTAL={tot*1e3:.0f}ms  ({g2.nbytes/1e6:.1f} MB pulled)", flush=True)


if __name__ == "__main__":
    main()
