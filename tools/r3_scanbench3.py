"""Part 3: is the ~17 us/step floor per-TAKE or per-ROW?

Measures scan bodies with k takes of w rows each (k x w grid), plus a
packed-u16 variant (mask+corr in one array -> one take returns both), at
batch lanes R=4096.  Informs merging the production fast2 body's 7 takes.
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

V, R, STEPS = 8192, 4096, 2048
rng = np.random.RandomState(0)


def mkidx(w):
    return jnp.asarray(rng.randint(0, V, size=(STEPS, w)).astype(np.int32))


OFF = jnp.asarray((np.arange(STEPS, dtype=np.int32) * 64) % (V - 64))


def run(name, body, xs, dtype=jnp.uint8):
    f = jax.jit(
        lambda a, xs: jnp.sum(
            jax.lax.scan(body, a, xs)[0].astype(jnp.uint32)
        )
    )
    seeds = [jnp.full((V, R), i, dtype) for i in range(3)]
    np.asarray(f(seeds[0], xs))
    best = 1e9
    for i in (1, 2):
        t0 = time.time()
        np.asarray(f(seeds[i], xs))
        best = min(best, time.time() - t0)
    print(f"{name:34s} {best*1e6/STEPS:8.1f} us/step", flush=True)


# --- k takes of w rows, then one dus write of 64 rows ---
for k, w in [(1, 64), (2, 64), (4, 64), (7, 64), (1, 128), (1, 256),
             (2, 128), (1, 448)]:
    idxs = [mkidx(w) for _ in range(k)]
    xs = {f"i{j}": idxs[j] for j in range(k)}
    xs["off"] = OFF

    def body(ar, ws, k=k):
        acc = jnp.take(ar, ws["i0"], axis=0)
        for j in range(1, k):
            acc = acc ^ jnp.take(ar, ws[f"i{j}"], axis=0)
        v = jax.lax.optimization_barrier(acc[:64])
        return jax.lax.dynamic_update_slice_in_dim(ar, v, ws["off"], axis=0), None

    run(f"{k} takes x {w} rows", body, xs)

# --- u16-packed arena: one take yields both mask and corr planes ---
xs = {"i0": mkidx(64), "off": OFF}


def body16(ar, ws):
    mc = jnp.take(ar, ws["i0"], axis=0)
    m = (mc & 0xFF).astype(jnp.uint8)
    c = (mc >> 8).astype(jnp.uint8)
    v = jax.lax.optimization_barrier(
        (m ^ c).astype(jnp.uint16) | (jnp.uint16(1) << 8))
    return jax.lax.dynamic_update_slice_in_dim(ar, v, ws["off"], axis=0), None


run("u16 packed, 1 take x 64", body16, xs, dtype=jnp.uint16)
