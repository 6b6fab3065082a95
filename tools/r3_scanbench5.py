"""Part 5: does per-step gather/DUS cost scale with arena HEIGHT (V)?

Same takes+dus body (4 arena takes + 2 tape takes + 2 DUS writes), W=64,
R=4096, varying V.  If cost grows with V, liveness-based slot reuse in the
scan compiler (small ring arena) is the fix for deep-circuit execution."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

U8 = jnp.uint8
NW, W, R, T = 2048, 64, 4096, 65536


def dev_idx(shape, hi, salt):
    a = jnp.arange(shape[0], dtype=jnp.uint32)[:, None]
    b = jnp.arange(shape[1], dtype=jnp.uint32)[None, :]
    mixed = a * jnp.uint32(2654435761) + b * jnp.uint32(40503) + jnp.uint32(salt)
    return (mixed % jnp.uint32(hi)).astype(jnp.int32)


mk8 = jax.jit(lambda salt, n: (
    (jnp.arange(n, dtype=jnp.uint32)[:, None] * 131
     + jnp.arange(R, dtype=jnp.uint32)[None, :] * 7 + salt) & 0xFF
).astype(jnp.uint8), static_argnums=(1,))
tape2_dev = jax.block_until_ready(mk8(11, T))


def body(carry, w, tape2):
    mask2, corr2 = carry
    a_m = jnp.take(mask2, w["a"], axis=0)
    a_c = jnp.take(corr2, w["a"], axis=0)
    b_m = jnp.take(mask2, w["b"], axis=0)
    b_c = jnp.take(corr2, w["b"], axis=0)
    t0 = jnp.take(tape2, w["t0"], axis=0)
    t1 = jnp.take(tape2, w["t1"], axis=0)
    upd = jax.lax.optimization_barrier((a_m ^ b_m ^ t0, a_c ^ b_c ^ t1))
    mask2 = jax.lax.dynamic_update_slice_in_dim(mask2, upd[0], w["slot0"], axis=0)
    corr2 = jax.lax.dynamic_update_slice_in_dim(corr2, upd[1], w["slot0"], axis=0)
    return (mask2, corr2), None


for V in (4096, 8192, 32768, 131072, 262144):
    xs = jax.block_until_ready(jax.jit(lambda: {
        "a": dev_idx((NW, W), V, 2),
        "b": dev_idx((NW, W), V, 3),
        "t0": dev_idx((NW, W), T, 4),
        "t1": dev_idx((NW, W), T, 5),
        "slot0": (jnp.arange(NW, dtype=jnp.int32) * W) % (V - W),
    })())

    def outer(seed, xs, tape2, V=V):
        mask2 = jnp.full((V, R), seed, U8)
        corr2 = jnp.full((V, R), seed ^ 1, U8)
        (m, c), _ = jax.lax.scan(
            lambda carry, w: body(carry, w, tape2), (mask2, corr2), xs)
        return jnp.sum(m[:64].astype(jnp.uint32)) + jnp.sum(c[:64].astype(jnp.uint32))

    f = jax.jit(outer)
    np.asarray(f(jnp.uint8(0), xs, tape2_dev))
    best = 1e9
    for i in (1, 2):
        t0 = time.time()
        np.asarray(f(jnp.uint8(i), xs, tape2_dev))
        best = min(best, time.time() - t0)
    print(f"V={V:7d}  {best*1e6/NW:8.1f} us/step   total {best:.3f}s", flush=True)
