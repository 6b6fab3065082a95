"""HW bench: full hash_columns pipeline from the (T, R) byte buffer at the
1M-gate transcript shapes, XLA vs Pallas bulk kernels.

Protocol: varied data-dependent inputs (salt threaded from the previous
output), host-pull fenced (tools/r3_exec_ablate.py).  The input generation
pass is measured alone and subtracted.
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from reverie_tpu.crypto.kernels.blake3_jax import hash_columns

R = 256


def run(T, variant, iters=5):
    os.environ.pop("REVERIE_PALLAS_BLAKE3", None)
    os.environ.pop("REVERIE_BLAKE3_SCAN", None)
    if variant == "scan":  # the pre-round-3 transposed words-scan
        os.environ["REVERIE_BLAKE3_SCAN"] = "1"
    elif variant not in ("xla", "idx"):  # "xla"/"idx" = indexed scan default
        os.environ["REVERIE_PALLAS_BLAKE3"] = variant
    GB = T * R / 1e9

    @jax.jit
    def gen(salt):
        return (
            jnp.arange(T, dtype=jnp.uint32)[:, None] * jnp.uint32(2654435761)
            + jnp.arange(R, dtype=jnp.uint32)[None, :] + salt
        ).astype(jnp.uint8)

    @jax.jit
    def step(salt):
        h = hash_columns(gen(salt), T)
        return h[0, 0].astype(jnp.uint32)

    # gen-alone baseline
    s = gen(jnp.uint32(0))[0, 0].astype(jnp.uint32)
    np.asarray(s)
    t0 = time.time(); np.asarray(s); pull = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        s = gen(s)[0, 0].astype(jnp.uint32)
    np.asarray(s)
    tgen = max(time.time() - t0 - pull, 0) / iters

    s = step(jnp.uint32(1))
    np.asarray(s)
    t0 = time.time()
    for _ in range(iters):
        s = step(s)
    np.asarray(s)
    dt = max((time.time() - t0 - pull) / iters - tgen, 1e-9)
    print(f"T={T:9d} {variant:8s} {dt*1e3:8.2f} ms  ~{GB/dt:6.1f} GB/s"
          f"  (gen {tgen*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    variants = sys.argv[1:] or ["idx", "scan", "2"]
    for T in (2_000_000, 1_000_000):
        for v in variants:
            run(T, v)
