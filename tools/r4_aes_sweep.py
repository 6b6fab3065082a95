"""Round-4: AES tape kernel tile_b sweep at the production 1M-prove shape
(B=15626 blocks, 2048 keys -> Kw=64, bpr=2 lane packing), slope-timed.

The production call uses the kernel default tile_b=32 (T=16 vector rows per
plane after bpr packing).  The round-3 sweep stopped early (remote compile
failure at tile_b=128); this one guards per-shape failures and also times
the std (non-colsched) body at the best tile for reference.
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

U32 = jnp.uint32
R = 256
B = 15626


def slope(step, s0, k_lo=2, k_hi=8, reps=3):
    def run(k):
        s = step(s0 + jnp.uint32(1))
        float(np.asarray(s))
        t0 = time.time()
        for _ in range(k):
            s = step(s)
        float(np.asarray(s))
        return time.time() - t0

    return min((run(k_hi) - run(k_lo)) / (k_hi - k_lo) for _ in range(reps))


def main():
    from reverie_tpu.crypto.kernels import aes_jax as aj
    from reverie_tpu.crypto.kernels.aes_pallas import aes_ctr_tape_gf2_pallas

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(7)
    pk = rng.integers(0, 256, (R * 8, 16), dtype=np.uint8)
    keys_d = jnp.asarray(pk)
    mask_d = jnp.asarray(np.full(pk.shape[0] // 32, 0xFFFFFFFF, np.uint32))

    def _ck(t):
        return jnp.sum(t.astype(U32), dtype=U32)

    ref = None
    for cs in (True, False):
        for tile_b in (16, 32, 64, 128, 256, 512):
            try:
                @jax.jit
                def tape_step(s, tile_b=tile_b, cs=cs):
                    k = keys_d ^ (s & jnp.uint32(0xFF)).astype(jnp.uint8)
                    t = aes_ctr_tape_gf2_pallas(
                        aj.round_key_planes_device(k), B, mask_d,
                        tile_b=tile_b, colsched=cs,
                    )
                    return _ck(t)

                # byte-check vs the default shape first
                got = tape_step(jnp.uint32(3))
                if ref is None:
                    ref = int(got)
                assert int(got) == ref, f"checksum mismatch {int(got)} vs {ref}"
                d = slope(tape_step, jnp.uint32(0))
                print(f"colsched={int(cs)} tile_b={tile_b:4d}: {d*1e3:6.1f} ms",
                      flush=True)
            except Exception as e:
                print(f"colsched={int(cs)} tile_b={tile_b:4d}: FAIL "
                      f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
