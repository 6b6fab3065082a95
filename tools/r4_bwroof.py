"""Round-4: trustworthy streaming-bandwidth roof measurement.

Ad-hoc jnp probes that close over large device arrays report unphysical
numbers (19 TB/s "reads"): a closed-over array is a jaxpr CONSTANT, so XLA
constant-folds the whole reduction at compile time (and the axon remote
compile endpoint rejects >large modules with HTTP 413).  Arrays here are
explicit donated arguments chained through the jit, content perturbed from
the chain scalar each iteration -- the devlim harness shape that produced
production-phase numbers consistent across methods.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

U32 = jnp.uint32
GB = 1e9


def slope_arr(step, s0, x0, k_lo=2, k_hi=8, reps=3):
    """step: (s, x) -> (s', x'), donating x.  Returns per-iter seconds."""
    s, x = step(s0 + jnp.uint32(1), x0)
    float(np.asarray(s))  # warm

    def run(k):
        nonlocal s, x
        t0 = time.time()
        for _ in range(k):
            s, x = step(s, x)
        float(np.asarray(s))
        return time.time() - t0

    best = None
    for _ in range(reps):
        t_hi = run(k_hi)
        t_lo = run(k_lo)
        d = (t_hi - t_lo) / (k_hi - k_lo)
        best = d if best is None else min(best, d)
    return best


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def pallas_copy(x, tr=512):
    n, c = x.shape
    return pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        grid=(n // tr,),
        in_specs=[pl.BlockSpec((tr, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tr, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(5)
    a8 = jnp.asarray(rng.integers(0, 256, (2_000_000, 256), dtype=np.uint8))
    a32 = jnp.asarray(rng.integers(0, 2**31, (500_000, 256), dtype=np.int64)
                      .astype(np.uint32))
    nb8 = a8.size
    nb32 = a32.size * 4

    @jax.jit
    def u8_fold(s, x):
        # 1 read pass; output tiny
        return jnp.sum(x.astype(U32), dtype=U32) + s, x

    @jax.jit
    def u8_perturb_fold(s, x):
        # read + write + read: perturb whole array, fold it, carry it
        x = x ^ (s & jnp.uint32(0xFF)).astype(jnp.uint8)
        return jnp.sum(x.astype(U32), dtype=U32), x

    @jax.jit
    def u8_pallas_copy(s, x):
        y = pallas_copy(x ^ (s & jnp.uint32(0xFF)).astype(jnp.uint8))
        return jnp.sum(y[::4096].astype(U32), dtype=U32), y

    @jax.jit
    def u32_pallas_copy(s, x):
        y = pallas_copy(x ^ s)
        return jnp.sum(y[::4096], dtype=U32), y

    cases = (
        ("u8 fold (1 pass)", u8_fold, a8, nb8, 1, False),
        ("u8 xor+fold+carry (3 passes)", u8_perturb_fold, a8, nb8, 3, True),
        ("u8 xor+pallas copy (3 passes)", u8_pallas_copy, a8, nb8, 3, True),
        ("u32 xor+pallas copy (3 passes)", u32_pallas_copy, a32, nb32, 3, True),
    )
    for name, f, x0, nb, passes, donate in cases:
        fn = jax.jit(f, donate_argnums=(1,)) if donate else f
        x0 = jnp.array(x0)  # fresh buffer: earlier cases donate theirs
        d = slope_arr(fn, jnp.uint32(0), x0)
        print(f"{name:32s} {d*1e3:7.2f} ms -> {passes*nb/d/GB:6.0f} GB/s agg "
              f"({nb/GB:.2f} GB/pass)", flush=True)


if __name__ == "__main__":
    main()
