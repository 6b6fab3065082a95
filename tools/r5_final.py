"""Round-5 one-shot HW revalidation: run after a tunnel outage to confirm
the chip-side paths are healthy before the final bench.

quick: golden battery spot (2 circuits) + u8/z64 kernel byte-exactness
full:  the whole golden battery + devlim slope
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

from reverie_tpu.crypto.kernels import aes_jax as aj
from reverie_tpu.crypto.kernels.aes_pallas import (
    aes_ctr_tape_gf2_pallas, aes_ctr_tape_gf2_pallas_u8,
    aes_ctr_tape_z64_pallas)


def kernels_ok() -> bool:
    rng = np.random.RandomState(7)
    R, nb = 256, 64
    keys = rng.randint(0, 256, size=(R * 8, 16), dtype=np.uint8)
    mask = np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32)
    want = jax.jit(lambda k, m: aes_ctr_tape_gf2_pallas(
        aj.round_key_planes_device(k), nb, m, split=True))(
        jnp.asarray(keys), jnp.asarray(mask))
    got = jax.jit(lambda k, m: aes_ctr_tape_gf2_pallas_u8(
        k, nb, m, split=True))(jnp.asarray(keys), jnp.asarray(mask))
    ok1 = all(np.array_equal(np.asarray(want[i]), np.asarray(got[i]))
              for i in range(2))
    wz = jax.jit(lambda k, m: aj.aes_ctr_tape_z64_chunked(
        aj.round_key_planes_device(k), aj.counter_planes_device(16), m))(
        jnp.asarray(keys), jnp.asarray(mask))
    gz = jax.jit(lambda k, m: aes_ctr_tape_z64_pallas(k, 16, m))(
        jnp.asarray(keys), jnp.asarray(mask))
    ok2 = all(np.array_equal(np.asarray(wz[i]), np.asarray(gz[i]))
              for i in range(2))
    print(f"u8 tape byte-exact: {ok1}; z64 tape byte-exact: {ok2}",
          flush=True)
    return ok1 and ok2


def golden_spot() -> bool:
    import pickle

    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.circuit.builders import mul_bench_circuit

    golden = {}
    if os.path.exists("/tmp/golden_proofs.pkl"):
        golden = pickle.load(open("/tmp/golden_proofs.pkl", "rb"))
    rng = np.random.RandomState(42)
    seeds = rng.randint(0, 256, size=(32, 8, 16), dtype=np.uint8)
    prog, wit2, witz = mul_bench_circuit(2500)
    sys_ = TpuKKW(prog)
    p = sys_.prove(wit2, witz, seeds=seeds.reshape(256, 16))
    ok = sys_.verify(p)
    gm = (golden.get("aes_dev") == p.to_bytes()) if "aes_dev" in golden else None
    print(f"aes_dev: verify={ok} golden_match={gm}", flush=True)
    return ok and gm is not False


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    print("devices:", jax.devices(), flush=True)
    ok = kernels_ok() and golden_spot()
    print("REVALIDATION:", "OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)
