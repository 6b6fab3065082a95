"""Round-2 continuation #2 (single TPU process):

1. tunnel: corrected overlap test (device-generated arrays, no host-copy
   caching) + concurrency scaling (1/2/4 streams)
2. AES tape kernel tile_b sweep at the headline shape (B=15626, Kw=64)
3. prove_many pipelined throughput on the 1M-gate circuit + byte-identity
4. z64 50k prove phase profile
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
    log("== part 1: tunnel (corrected) ==")
    n = 10 * (1 << 20)

    @jax.jit
    def gen(seed):
        k = jax.random.PRNGKey(seed)
        return jax.random.bits(k, (n,), dtype=jnp.uint8)

    # concurrency scaling with FRESH arrays each time
    for nstreams in (1, 2, 4):
        xs = [gen(100 + 7 * i + nstreams) for i in range(nstreams)]
        jax.block_until_ready(xs)
        t0 = time.time()
        for x in xs:
            x.copy_to_host_async()
        _ = [np.asarray(x) for x in xs]
        dt = time.time() - t0
        log(f"{nstreams} streams x 10MB: {dt:.3f}s = {nstreams*10/dt:.1f} MB/s aggregate")

    # overlap: pull a READY fresh array while an independent compute runs
    @jax.jit
    def burn(a):
        def body(c, _):
            return (c @ c) * 1e-3 + a, ()
        c, _ = jax.lax.scan(body, a, None, length=3000)
        return c

    a = jax.device_put(np.random.rand(2048, 2048).astype(np.float32))
    jax.block_until_ready(burn(a))
    t0 = time.time()
    jax.block_until_ready(burn(a))
    t_burn = time.time() - t0
    y = gen(999)
    jax.block_until_ready(y)
    t0 = time.time()
    r = burn(a)          # dispatch long compute
    y.copy_to_host_async()
    _ = np.asarray(y)    # fresh pull of ready data
    t_pull_during = time.time() - t0
    jax.block_until_ready(r)
    t_all = time.time() - t0
    y2 = gen(998)
    jax.block_until_ready(y2)
    t0 = time.time()
    _ = np.asarray(y2)
    t_pull_alone = time.time() - t0
    log(f"compute alone {t_burn:.3f}s | pull alone {t_pull_alone:.3f}s | "
        f"pull during compute {t_pull_during:.3f}s (overlap if ~= alone) | "
        f"both done {t_all:.3f}s (serial would be {t_burn + t_pull_alone:.3f}s)")


def part2_aes_sweep():
    log("== part 2: AES tile_b sweep ==")
    from reverie_tpu.crypto import expand_seeds
    from reverie_tpu.crypto.kernels import aes_jax as aj
    from reverie_tpu.crypto.kernels.aes_pallas import aes_ctr_tape_gf2_pallas

    R = 256
    rng = np.random.RandomState(7)
    seeds = rng.randint(0, 256, size=(R, 16), dtype=np.uint8)
    pk = expand_seeds(seeds).reshape(R, 8, 16)
    rkp = jnp.asarray(aj.round_key_planes(pk.reshape(-1, 16)))
    mask = jnp.asarray(np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32))
    B = 15626
    ref = None
    for tb in (16, 32, 64, 128):
        f = jax.jit(aes_ctr_tape_gf2_pallas, static_argnums=(1, 4))
        try:
            t0 = time.time()
            out = f(rkp, B, mask, 0, tb)
            jax.block_until_ready(out)
            warm = time.time() - t0
            times = []
            for _ in range(3):
                t0 = time.time()
                jax.block_until_ready(f(rkp, B, mask, 0, tb))
                times.append(time.time() - t0)
            dt = min(times)
            if ref is None:
                ref = out
                eq = "ref"
            else:
                eq = "ok" if int(jax.jit(lambda a, b: (a != b).sum())(out, ref)) == 0 else "DIVERGE"
            log(f"tile_b={tb}: best {dt:.3f}s ({B*16*2048/1e9/dt:.1f} GB/s) warm {warm:.1f}s [{eq}]")
        except Exception as e:
            log(f"tile_b={tb}: FAILED {type(e).__name__}: {str(e)[:200]}")


def part3_pipeline():
    log("== part 3: prove_many pipelined 1M ==")
    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.circuit.builders import mul_bench_circuit

    os.environ.pop("REVERIE_PROFILE", None)
    prog, wit2, witz = mul_bench_circuit(1_000_000)
    sys_ = TpuKKW(prog)
    npf = 4
    seeds = np.random.RandomState(0).randint(
        0, 256, size=(npf, 256, 16), dtype=np.uint8
    )
    # warm all compiles via one single prove
    t0 = time.time()
    p0 = sys_.prove(wit2, witz, seeds=seeds[0])
    log(f"single warm {time.time()-t0:.1f}s")
    t0 = time.time()
    p0 = sys_.prove(wit2, witz, seeds=seeds[0])
    t_single = time.time() - t0
    log(f"single steady {t_single:.3f}s -> {1.0/t_single:.2f}M gates/s")
    jobs = [(wit2, witz)] * npf
    for it in range(2):
        t0 = time.time()
        proofs = sys_.prove_many(jobs, seeds=seeds)
        dt = time.time() - t0
        log(f"prove_many x{npf} #{it}: {dt:.3f}s -> {npf/dt:.2f} proofs/s = "
            f"{npf*1.0/dt:.2f}M gates/s")
    assert proofs[0].to_bytes() == p0.to_bytes(), "pipeline byte mismatch!"
    log("byte-identity ok")
    ok = sys_.verify(proofs[1])
    log(f"verify ok={ok}")


def part4_z64():
    log("== part 4: z64 profile ==")
    os.environ["REVERIE_PROFILE"] = "1"
    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.circuit.builders import z64_mul_bench_circuit

    n = 50_000
    prog, wit2, witz = z64_mul_bench_circuit(n)
    sys_ = TpuKKW(prog)
    seeds = np.random.RandomState(2).randint(0, 256, size=(256, 16), dtype=np.uint8)
    t0 = time.time()
    sys_.prove(wit2, witz, seeds=seeds)
    log(f"warm {time.time()-t0:.1f}s")
    for it in range(2):
        t0 = time.time()
        sys_.prove(wit2, witz, seeds=seeds)
        dt = time.time() - t0
        log(f"steady#{it} {dt:.2f}s -> {n/dt/1e3:.1f}k z64 gates/s")
    # pipelined z64
    os.environ.pop("REVERIE_PROFILE", None)
    jobs = [(wit2, witz)] * 4
    seeds4 = np.random.RandomState(6).randint(0, 256, size=(4, 256, 16), dtype=np.uint8)
    for it in range(2):
        t0 = time.time()
        sys_.prove_many(jobs, seeds=seeds4)
        dt = time.time() - t0
        log(f"prove_many x4 #{it}: {dt:.2f}s -> {4*n/dt/1e3:.1f}k z64 gates/s")


if __name__ == "__main__":
    parts = sys.argv[1:] or ["1", "2", "3", "4"]
    if "1" in parts:
        part1_tunnel()
    if "2" in parts:
        part2_aes_sweep()
    if "3" in parts:
        part3_pipeline()
    if "4" in parts:
        part4_z64()
