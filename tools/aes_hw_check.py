"""HW check for the block-major Pallas AES tape kernel (post r2d layout fix).

1. Byte-exact vs host golden at the 1M-prove shape (B=15626, Kw=64, bpr=2).
2. Timing with a *varied* start_block per iteration: the axon relay caches
   identical (executable, inputs) executions, so repeating the same call
   under-reports (tools/r2s3.py part 4 measured 0 ms).
3. Segment-size compile check (B=32768, traced start) -- the shape that
   allocated 64 GiB via the old post-kernel moveaxis.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from reverie_tpu.backend.tpu_host import build_tapes
from reverie_tpu.crypto import expand_seeds
from reverie_tpu.crypto.kernels import aes_jax as aj
from reverie_tpu.crypto.kernels.aes_pallas import aes_ctr_tape_gf2_pallas

R = 256
rng = np.random.RandomState(7)
seeds = rng.randint(0, 256, size=(R, 16), dtype=np.uint8)
pk = expand_seeds(seeds).reshape(R, 8, 16)
rkp = jnp.asarray(aj.round_key_planes(pk.reshape(-1, 16)))
mask = jnp.asarray(np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32))

# 1. byte-exact at the headline shape
B = 15626
f = jax.jit(aes_ctr_tape_gf2_pallas, static_argnums=(1,))
t0 = time.time()
tape = np.asarray(f(rkp, B, mask, np.int32(0)))
print(f"warm+pull {time.time()-t0:.1f}s", flush=True)
m2 = 2_000_002
golden, _, _ = build_tapes(pk, None, m2, 0)
assert tape.shape[0] >= m2
np.testing.assert_array_equal(tape[:m2], golden)
print("byte-exact at B=15626 OK", flush=True)

# window check: start_block=100 equals rows [12800:...]
tapew = np.asarray(f(rkp, 256, mask, np.int32(100)))
np.testing.assert_array_equal(tapew, tape[100 * 128 : (100 + 256) * 128])
print("start_block window OK", flush=True)

# 2. timing, varied start_block (defeats relay execution caching)
for it in range(4):
    t0 = time.time()
    jax.block_until_ready(f(rkp, B, mask, np.int32(it + 1)))
    dt = time.time() - t0
    print(f"tape B={B} #{it}: {dt*1e3:.0f}ms = {B*16*2048/1e9/dt:.1f} GB/s "
          f"(keystream)", flush=True)

# 3. segment-size compile (the old 64 GiB alloc shape)
B2 = 32768
t0 = time.time()
out = f(rkp, B2, mask, np.int32(3))
jax.block_until_ready(out)
print(f"B=32768 warm {time.time()-t0:.1f}s shape={out.shape}", flush=True)
np.testing.assert_array_equal(
    np.asarray(out[: 256 * 128]),
    np.asarray(f(rkp, 256, mask, np.int32(3))),
)
print("B=32768 prefix matches windowed call OK", flush=True)
for it in range(3):
    t0 = time.time()
    jax.block_until_ready(f(rkp, B2, mask, np.int32(10 + it)))
    dt = time.time() - t0
    print(f"tape B={B2} #{it}: {dt*1e3:.0f}ms = {B2*16*2048/1e9/dt:.1f} GB/s",
          flush=True)
print("ALL OK", flush=True)
