"""Axon tunnel characterization (one TPU process):

A. device->host pull bandwidth vs transfer size (1/4/10/40 MB)
B. two concurrent async pulls: does the tunnel multiplex (aggregate > single)?
C. pull overlapping device compute: can a host pull proceed while the chip
   runs an independent program (the precondition for pipelined proving)?
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, flush=True)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")

    # A. pull bandwidth vs size
    for mb in (1, 4, 10, 40):
        n = mb * (1 << 20)
        x = jax.device_put(np.random.randint(0, 256, n, dtype=np.uint8))
        jax.block_until_ready(x)
        for it in range(2):
            t0 = time.time()
            _ = np.asarray(x)
            dt = time.time() - t0
            log(f"A pull {mb}MB try{it}: {dt:.3f}s = {mb/dt:.1f} MB/s")

    # B. two concurrent async pulls
    n = 10 * (1 << 20)
    xs = [jax.device_put(np.random.randint(0, 256, n, dtype=np.uint8))
          for _ in range(2)]
    jax.block_until_ready(xs)
    t0 = time.time()
    for x in xs:
        x.copy_to_host_async()
    outs = [np.asarray(x) for x in xs]
    dt = time.time() - t0
    log(f"B concurrent 2x10MB: {dt:.3f}s = {20/dt:.1f} MB/s aggregate")

    # C. pull while compute runs
    @jax.jit
    def burn(a):
        def body(c, _):
            c = (c @ c) * 1e-3 + a
            return c, ()
        c, _ = jax.lax.scan(body, a, None, length=400)
        return c

    a = jax.device_put(np.random.rand(2048, 2048).astype(np.float32))
    r = burn(a)
    jax.block_until_ready(r)  # warm compile
    t0 = time.time()
    r = burn(a)
    jax.block_until_ready(r)
    t_burn = time.time() - t0
    log(f"C compute alone: {t_burn:.3f}s")

    x = jax.device_put(np.random.randint(0, 256, n, dtype=np.uint8))
    jax.block_until_ready(x)
    t0 = time.time()
    _ = np.asarray(x)
    t_pull = time.time() - t0
    log(f"C pull alone: {t_pull:.3f}s")

    t0 = time.time()
    r = burn(a)           # dispatch compute (async)
    x.copy_to_host_async()
    host = np.asarray(x)  # pull while compute runs?
    t_mid = time.time() - t0
    jax.block_until_ready(r)
    t_all = time.time() - t0
    log(f"C overlapped: pull-done {t_mid:.3f}s, both-done {t_all:.3f}s "
        f"(serial would be {t_burn + t_pull:.3f}s)")
    ov = (t_burn + t_pull - t_all) / min(t_burn, t_pull)
    log(f"C overlap fraction: {ov:.2f} (1.0 = full overlap, 0 = serial)")


if __name__ == "__main__":
    main()
