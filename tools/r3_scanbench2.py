"""Part 2 of the scan-step microbenchmark: does lax.scan(unroll=K) amortize
the ~17-20 us/step dispatch floor seen in r3_scanbench.py?  Uses the
gather+dus shape (the production fast2 body's access pattern) at batch lanes
(R=4096) and single-proof lanes (R=256)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V, W, STEPS = 8192, 64, 2048
rng = np.random.RandomState(0)
A = rng.randint(0, V, size=(STEPS, W)).astype(np.int32)
B = rng.randint(0, V, size=(STEPS, W)).astype(np.int32)
OFF = (np.arange(STEPS, dtype=np.int32) * W) % (V - W)
xs = {"a": jnp.asarray(A), "b": jnp.asarray(B), "off": jnp.asarray(OFF)}


def body(ar, w):
    a = jnp.take(ar, w["a"], axis=0)
    b = jnp.take(ar, w["b"], axis=0)
    v = jax.lax.optimization_barrier(a ^ b)
    return jax.lax.dynamic_update_slice_in_dim(ar, v, w["off"], axis=0), None


def run(R, unroll):
    f = jax.jit(
        lambda a, xs: jnp.sum(
            jax.lax.scan(body, a, xs, unroll=unroll)[0].astype(jnp.uint32)
        )
    )
    seeds = [jnp.full((V, R), i, jnp.uint8) for i in range(3)]
    t0 = time.time()
    np.asarray(f(seeds[0], xs))
    compile_s = time.time() - t0
    best = 1e9
    for i in (1, 2):
        t0 = time.time()
        np.asarray(f(seeds[i], xs))
        best = min(best, time.time() - t0)
    print(
        f"R={R:5d} unroll={unroll:2d}  {best*1e6/STEPS:8.1f} us/step"
        f"   total {best:.3f}s   (compile {compile_s:.1f}s)",
        flush=True,
    )


for R in (4096, 256):
    for unroll in (1, 2, 4, 8, 16):
        run(R, unroll)
