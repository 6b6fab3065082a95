"""Round-2 continuation measurements (single TPU process, run in background):

1. tunnel characterization (pull bandwidth, concurrency, compute overlap)
2. AES tape kernel w/ lane packing: HW byte-equality vs XLA kernel + timing
   at the headline shape (B=15626, Kw=64)
3. 1M-gate prove phase profile (x3 steady)
4. prove_batch N=8 / N=16 phase profiles (regression triage)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["REVERIE_PROFILE"] = "1"

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, flush=True)


def part1_tunnel():
    log("== part 1: tunnel ==")
    for mb in (1, 10, 40):
        n = mb * (1 << 20)
        x = jax.device_put(np.random.randint(0, 256, n, dtype=np.uint8))
        jax.block_until_ready(x)
        for it in range(2):
            t0 = time.time()
            _ = np.asarray(x)
            dt = time.time() - t0
            log(f"pull {mb}MB try{it}: {dt:.3f}s = {mb/dt:.1f} MB/s")

    n = 10 * (1 << 20)
    xs = [jax.device_put(np.random.randint(0, 256, n, dtype=np.uint8))
          for _ in range(2)]
    jax.block_until_ready(xs)
    t0 = time.time()
    for x in xs:
        x.copy_to_host_async()
    outs = [np.asarray(x) for x in xs]
    dt = time.time() - t0
    log(f"concurrent 2x10MB: {dt:.3f}s = {20/dt:.1f} MB/s aggregate")

    @jax.jit
    def burn(a):
        def body(c, _):
            return (c @ c) * 1e-3 + a, ()
        c, _ = jax.lax.scan(body, a, None, length=400)
        return c

    a = jax.device_put(np.random.rand(2048, 2048).astype(np.float32))
    jax.block_until_ready(burn(a))
    t0 = time.time()
    jax.block_until_ready(burn(a))
    t_burn = time.time() - t0
    x = jax.device_put(np.random.randint(0, 256, n, dtype=np.uint8))
    jax.block_until_ready(x)
    t0 = time.time()
    _ = np.asarray(x)
    t_pull = time.time() - t0
    t0 = time.time()
    r = burn(a)
    x.copy_to_host_async()
    _ = np.asarray(x)
    t_mid = time.time() - t0
    jax.block_until_ready(r)
    t_all = time.time() - t0
    log(f"compute {t_burn:.3f}s pull {t_pull:.3f}s | overlapped: pull-done "
        f"{t_mid:.3f}s both {t_all:.3f}s serial-would-be {t_burn+t_pull:.3f}s")


def part2_aes():
    log("== part 2: AES tape kernel (lane packed) ==")
    from reverie_tpu.crypto import expand_seeds
    from reverie_tpu.crypto.kernels import aes_jax as aj
    from reverie_tpu.crypto.kernels.aes_pallas import aes_ctr_tape_gf2_pallas

    R = 256
    rng = np.random.RandomState(7)
    seeds = rng.randint(0, 256, size=(R, 16), dtype=np.uint8)
    pk = expand_seeds(seeds).reshape(R, 8, 16)
    rkp = aj.round_key_planes(pk.reshape(-1, 16))
    mask = np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32)
    B = 15626  # 1M-gate tape
    fp = jax.jit(aes_ctr_tape_gf2_pallas, static_argnums=(1,))
    fx = jax.jit(aj.aes_ctr_tape_gf2)
    t0 = time.time()
    tp = fp(jnp.asarray(rkp), B, jnp.asarray(mask))
    jax.block_until_ready(tp)
    log(f"pallas warm {time.time()-t0:.1f}s")
    ctrp = aj.counter_planes(B)
    t0 = time.time()
    tx = fx(jnp.asarray(rkp), jnp.asarray(ctrp), jnp.asarray(mask))
    jax.block_until_ready(tx)
    log(f"xla warm {time.time()-t0:.1f}s")
    # HW byte-equality (device-side compare; pull one scalar)
    neq = int(jax.jit(lambda a, b: (a != b).sum())(tp, tx))
    log(f"HW equality pallas-vs-xla at B={B}: mismatches={neq}")
    for name, f, args in (("pallas", fp, (jnp.asarray(rkp), B, jnp.asarray(mask))),
                          ("xla", fx, (jnp.asarray(rkp), jnp.asarray(ctrp), jnp.asarray(mask)))):
        for it in range(3):
            t0 = time.time()
            jax.block_until_ready(f(*args))
            log(f"aes {name} #{it}: {time.time()-t0:.3f}s "
                f"({B*16*2048/1e9/(time.time()-t0):.1f} GB/s keystream)")
    if neq:
        log("!! divergence — do not enable")
        return False
    return True


def part3_prove1m():
    log("== part 3: 1M prove profile ==")
    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.circuit.builders import mul_bench_circuit

    prog, wit2, witz = mul_bench_circuit(1_000_000)
    sys_ = TpuKKW(prog)
    seeds = np.random.RandomState(0).randint(0, 256, size=(256, 16), dtype=np.uint8)
    t0 = time.time()
    proof = sys_.prove(wit2, witz, seeds=seeds)
    log(f"warm {time.time()-t0:.1f}s")
    for it in range(3):
        t0 = time.time()
        proof = sys_.prove(wit2, witz, seeds=seeds)
        dt = time.time() - t0
        log(f"steady#{it} {dt:.3f}s -> {1e6/dt/1e6:.2f}M gates/s")
    ok = sys_.verify(proof)
    log(f"verify ok={ok}")


def part4_batch():
    log("== part 4: batch profiles ==")
    import hashlib

    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.circuit.sha256 import (
        block_to_witness_bits,
        sha256_pad_one_block,
        sha256_preimage_statement,
    )

    msg = b"batched preimage"
    prog, _ = sha256_preimage_statement(hashlib.sha256(msg).digest())
    wit = block_to_witness_bits(sha256_pad_one_block(msg))
    for N in (8, 16):
        sys_ = TpuKKW(prog)
        wits = [(wit, [])] * N
        seeds = np.random.RandomState(3).randint(
            0, 256, size=(N, 256, 16), dtype=np.uint8
        )
        t0 = time.time()
        sys_.prove_batch(wits, seeds=seeds)
        log(f"N={N} warm {time.time()-t0:.2f}s")
        for it in range(2):
            t0 = time.time()
            sys_.prove_batch(wits, seeds=seeds)
            dt = time.time() - t0
            log(f"N={N} steady#{it} {dt:.2f}s -> {N/dt:.2f} proofs/s")


if __name__ == "__main__":
    parts = sys.argv[1:] or ["1", "2", "3", "4"]
    ok = True
    if "1" in parts:
        part1_tunnel()
    if "2" in parts:
        ok = part2_aes()
    if "3" in parts and ok:
        part3_prove1m()
    if "4" in parts:
        part4_batch()
