"""Microbenchmark the scan-executor step primitives on TPU.

The prove_batch N=16 execute phase is ~0.72 s for ~5.2k scan steps
(~139 us/step) -- ~40x the HBM-roofline cost of the bytes each step touches.
This isolates which primitive burns the time: axis-0 gathers, row scatters,
or contiguous dynamic_update_slice writes, at the real shapes
(arena (V, R) u8, W=64 rows/step, R=4096 batch lanes).
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

V, W, R, STEPS = 8192, 64, 4096, 2048
rng = np.random.RandomState(0)
A = rng.randint(0, V, size=(STEPS, W)).astype(np.int32)
B = rng.randint(0, V, size=(STEPS, W)).astype(np.int32)
# disjoint scatter rows per step (the real compiler guarantees this)
D = np.stack([rng.permutation(V)[:W] for _ in range(STEPS)]).astype(np.int32)
OFF = (np.arange(STEPS, dtype=np.int32) * W) % (V - W)

arena0 = jnp.zeros((V, R), jnp.uint8)


def run(name, body, xs):
    # vary the arena seed per call: the axon relay caches repeated identical
    # executions, so identical inputs time as ~0
    f = jax.jit(
        lambda a, xs: jnp.sum(jax.lax.scan(body, a, xs)[0].astype(jnp.uint32))
    )
    seeds = [jnp.full((V, R), i, jnp.uint8) for i in range(3)]
    np.asarray(f(seeds[0], xs))  # compile + warm
    best = 1e9
    for i in (1, 2):
        t0 = time.time()
        np.asarray(f(seeds[i], xs))  # forced device->host round trip
        best = min(best, time.time() - t0)
    print(f"{name:28s} {best*1e6/STEPS:8.1f} us/step   total {best:.3f}s",
          flush=True)


xs_full = {"a": jnp.asarray(A), "b": jnp.asarray(B), "d": jnp.asarray(D),
           "off": jnp.asarray(OFF)}

# 1. gather only (2 gathers, fold into carry scalar-ish)
def g_only(ar, w):
    a = jnp.take(ar, w["a"], axis=0)
    b = jnp.take(ar, w["b"], axis=0)
    v = a ^ b
    # fold result into row 0 so nothing is dead
    return ar.at[0:1].set(v[0:1] ^ ar[0:1]), None


# 2. gather + row scatter (current executor shape)
def g_scat(ar, w):
    a = jnp.take(ar, w["a"], axis=0)
    b = jnp.take(ar, w["b"], axis=0)
    v = jax.lax.optimization_barrier(a ^ b)
    return ar.at[w["d"]].set(v), None


# 3. gather + contiguous dynamic_update_slice
def g_dus(ar, w):
    a = jnp.take(ar, w["a"], axis=0)
    b = jnp.take(ar, w["b"], axis=0)
    v = jax.lax.optimization_barrier(a ^ b)
    return jax.lax.dynamic_update_slice_in_dim(ar, v, w["off"], axis=0), None


# 4. scatter only (no gathers)
def s_only(ar, w):
    v = jax.lax.optimization_barrier(ar[:W] ^ jnp.uint8(1))
    return ar.at[w["d"]].set(v), None


# 5. dus only
def d_only(ar, w):
    v = jax.lax.optimization_barrier(ar[:W] ^ jnp.uint8(1))
    return jax.lax.dynamic_update_slice_in_dim(ar, v, w["off"], axis=0), None


# 6. dynamic-slice gathers (contiguous reads) + dus
def dus_both(ar, w):
    a = jax.lax.dynamic_slice_in_dim(ar, w["off"], W, axis=0)
    v = jax.lax.optimization_barrier(a ^ jnp.uint8(3))
    return jax.lax.dynamic_update_slice_in_dim(ar, v, w["off"], axis=0), None


for name, body in [("gather only", g_only), ("gather+scatter (current)", g_scat),
                   ("gather+dus", g_dus), ("scatter only", s_only),
                   ("dus only", d_only), ("dslice+dus", dus_both)]:
    run(name, body, xs_full)

# also at single-proof lanes
R = 256
arena0 = jnp.zeros((V, R), jnp.uint8)
print("--- R=256 ---")
for name, body in [("gather+scatter (current)", g_scat), ("gather+dus", g_dus)]:
    run(name, body, xs_full)
