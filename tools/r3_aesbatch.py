"""Where does prove_batch's tape phase go?  SHA-256 N=16: B=352 counter
blocks, 32768 keys (Kw=1024).  Times the Pallas kernel, the XLA kernel,
and the on-device key schedule separately at this shape, plus the
1M-single shape (B=15626, Kw=64) as a sanity anchor."""
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
from reverie_tpu.crypto.kernels.aes_pallas import aes_ctr_tape_gf2_pallas


def bench(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    nbytes = int(out.nbytes) if hasattr(out, "nbytes") else 0
    gbps = nbytes / best / 1e9 if nbytes else 0
    print(f"{name:44s} {best*1e3:8.1f} ms   {gbps:6.2f} GB/s", flush=True)
    return out


for B, nkeys in [(352, 32768), (15626, 2048)]:
    Kw = nkeys // 32
    print(f"--- B={B} keys={nkeys} (Kw={Kw}) tape={B*16*nkeys/1e6:.0f} MB ---")
    keys = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, size=(nkeys, 16), dtype=np.uint8)
    )
    mask = jnp.asarray(np.full(Kw, 0xFFFFFFFF, np.uint32))

    ks = jax.jit(aj.round_key_planes_device)
    rkp = bench("key schedule (round_key_planes_device)", ks, keys)

    pall = jax.jit(
        lambda rkp, mask: aes_ctr_tape_gf2_pallas(rkp, B, mask), backend="tpu"
    )
    bench("pallas kernel (incl. byte-split tail)", pall, rkp, mask)

    fused = jax.jit(
        lambda keys, mask: aes_ctr_tape_gf2_pallas(
            aj.round_key_planes_device(keys), B, mask
        )
    )
    bench("keys->schedule->pallas fused (prod path)", fused, keys, mask)

    xla = jax.jit(
        lambda rkp, ctrp, mask: aj.aes_ctr_tape_gf2(rkp, ctrp, mask)
    )
    ctrp = jax.block_until_ready(jax.jit(aj.counter_planes_device, static_argnums=0)(B))
    bench("xla kernel", xla, rkp, ctrp, mask)
