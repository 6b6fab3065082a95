"""Round 5: validate + time the in-kernel u8 tape emission
(aes_ctr_tape_gf2_pallas_u8) against the u32-emit + XLA-bitcast baseline.

Usage: python tools/r5_u8tape.py [check|time]
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
    aes_ctr_tape_gf2_pallas, aes_ctr_tape_gf2_pallas_u8)


def baseline(keys, nb, mask, split, start=0):
    return aes_ctr_tape_gf2_pallas(
        aj.round_key_planes_device(keys), nb, mask, start_block=start,
        split=split)


def check():
    rng = np.random.RandomState(7)
    cases = [
        # (R, n_blocks, split, omit?, start_block)
        (256, 64, True, False, 0),
        (256, 64, False, False, 0),
        (256, 100, True, True, 0),    # non-tile-multiple B + omit mask
        (64, 64, True, True, 0),      # verifier online pad shape (bpr=8)
        (512, 64, True, False, 0),    # batch N=2 (bpr=1, Kw=128)
        (768, 40, False, False, 0),   # odd batch (Kw=192, kwt=L)
        (1024, 40, True, False, 0),   # lane grid kt>0 (Kw=256, kwt=128)
        (256, 64, True, False, 1000),  # streaming window offset
    ]
    jb = jax.jit(baseline, static_argnums=(1, 3, 4))
    ju = jax.jit(
        lambda k, nb, m, s, st: aes_ctr_tape_gf2_pallas_u8(
            k, nb, m, split=s, start_block=st),
        static_argnums=(1, 3, 4),
    )
    for (R, nb, split, use_omit, start) in cases:
        keys = rng.randint(0, 256, size=(R * 8, 16), dtype=np.uint8)
        if use_omit:
            omit = rng.randint(0, 9, size=(R,)).astype(np.uint8)
            mask = aj.lane_mask_from_omit(omit, R)
        else:
            mask = np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32)
        want = jb(jnp.asarray(keys), nb, jnp.asarray(mask), split, start)
        got = ju(jnp.asarray(keys), nb, jnp.asarray(mask), split, start)
        if split:
            oks = [np.array_equal(np.asarray(want[i]), np.asarray(got[i]))
                   for i in range(2)]
            ok = all(oks)
        else:
            ok = np.array_equal(np.asarray(want), np.asarray(got))
        print(f"R={R:5d} B={nb:4d} split={int(split)} omit={int(use_omit)} "
              f"start={start}: byte-exact={ok}")
        if not ok:
            return False
    return True


def slope(fn, args, iters=(2, 8)):
    """Chained-slope timing: per-iter device ms via (T(K=8)-T(K=2))/6 with
    one pull; the perturb arg (keys row 0) changes per iter so the relay
    cannot replay."""
    res = {}
    for K in iters:
        t0 = time.perf_counter()
        acc = None
        for i in range(K):
            k2 = args[0].at[0, 0].set(np.uint8(i))
            out = fn(k2, *args[1:])
            parts = out if isinstance(out, tuple) else (out,)
            acc = parts[0][:1, :1] if acc is None else acc ^ parts[0][:1, :1]
        np.asarray(acc)
        res[K] = time.perf_counter() - t0
    return (res[iters[1]] - res[iters[0]]) / (iters[1] - iters[0]) * 1e3


def timing():
    R, nb = 256, 15626  # 1M-gate tape shape
    rng = np.random.RandomState(7)
    keys = jnp.asarray(rng.randint(0, 256, size=(R * 8, 16), dtype=np.uint8))
    mask = jnp.asarray(np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32))
    jb = jax.jit(baseline, static_argnums=(1, 3, 4))
    ju = jax.jit(
        lambda k, nb_, m: aes_ctr_tape_gf2_pallas_u8(k, nb_, m, split=True),
        static_argnums=(1,),
    )
    # warm
    jax.block_until_ready(jb(keys, nb, mask, True, 0))
    jax.block_until_ready(ju(keys, nb, mask))
    t_base = slope(lambda k, m: jb(k, nb, m, True, 0), (keys, mask))
    t_u8 = slope(lambda k, m: ju(k, nb, m), (keys, mask))
    print(f"1M tape (B={nb}, R={R}, split):")
    print(f"  u32-emit + XLA bitcast tail: {t_base:.2f} ms/iter")
    print(f"  in-kernel u8 emit:           {t_u8:.2f} ms/iter")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    print("devices:", jax.devices())
    if mode in ("check", "all"):
        ok = check()
        print("CHECK:", "OK" if ok else "FAIL")
        if not ok:
            sys.exit(1)
    if mode in ("time", "all"):
        timing()
