"""HW bench: blake3 chunk-CV kernels at the 1M-gate transcript shape
(T=2M rows -> n=2047 full chunks, R=256 reps), Pallas v3/v2/v1 vs XLA scan.

Timing protocol: the axon relay's block_until_ready returns before device
completion and caches identical executions, so each iteration's chunk_base
is chained from one lane of the previous output (data dependence, varied
inputs) and the loop is fenced by a tiny host pull whose latency is
measured and subtracted (see tools/r3_exec_ablate.py).  The words tensor is
generated ONCE -- only the counter scalar varies, which changes every CV.
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

from reverie_tpu.crypto.kernels.blake3_jax import _chunk_cvs
from reverie_tpu.crypto.kernels import blake3_pallas as bp

N, R = 2047, 256
GB = N * 16 * 16 * R * 4 / 1e9


def make_words():
    return jax.jit(lambda: (
        (jnp.arange(N * 16 * 16, dtype=jnp.uint32)[:, None] * jnp.uint32(2654435761)
         + jnp.arange(R, dtype=jnp.uint32)[None, :] * jnp.uint32(40503))
    ).reshape(N, 16, 16, R))()


def bench(name, fn, words, iters=6):
    f = jax.jit(fn)
    r0, _ = f(words, jnp.int32(0))
    base = r0[0, 0, 0].astype(jnp.int32)
    np.asarray(base)  # warm + fence
    t0 = time.time(); np.asarray(base); pull = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        r0, _ = f(words, base)
        base = r0[0, 0, 0].astype(jnp.int32)
    np.asarray(base)
    dt = max(time.time() - t0 - pull, 1e-9) / iters
    print(f"{name:22s} {dt*1e3:8.2f} ms  ~{GB/dt:6.1f} GB/s", flush=True)
    return dt


def check(name, fn, words):
    """byte-exactness vs the XLA words-scan path at a small shape."""
    w = words[:37]
    ref = _chunk_cvs(w, 16, np.full(16, 64, np.uint32),
                     jnp.uint32(5) + jnp.arange(37, dtype=jnp.uint32),
                     use_words=True)
    got = fn(w, jnp.int32(5))
    ok = all(np.array_equal(np.asarray(a), np.asarray(b))
             for a, b in zip(ref, got))
    print(f"{name:22s} byte-exact: {ok}", flush=True)
    return ok


def xla_scan(w, b):
    return _chunk_cvs(w, 16, np.full(16, 64, np.uint32),
                      jnp.asarray(b, jnp.uint32) + jnp.arange(w.shape[0], dtype=jnp.uint32),
                      use_words=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}  words tensor = {GB:.2f} GB", flush=True)
    words = make_words()
    np.asarray(words[0, 0, 0, 0])
    variants = [
        ("pallas_v3", lambda w, b: bp.chunk_cvs_pallas3(w, b)),
        ("pallas_v3_tc16", lambda w, b: bp.chunk_cvs_pallas3(w, b, tile_c=16)),
        ("pallas_v2", lambda w, b: bp.chunk_cvs_pallas2(w, b)),
        ("pallas_v1", lambda w, b: bp.chunk_cvs_pallas(w, b)),
        ("xla_words_scan", xla_scan),
    ]
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, fn in variants:
        if only and only not in name:
            continue
        try:
            check(name, fn, words)
            bench(name, fn, words)
        except Exception as e:
            print(f"{name:22s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
