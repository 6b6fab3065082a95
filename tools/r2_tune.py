"""Round-2 TPU tuning batch.

A. Transfer microbench: H2D/D2H bandwidth + per-call latency over the axon
   tunnel (sets the floor for extract/inject phases).
B. Fused Pallas AES tape kernel: steady time vs tile_b at Kw=64, B=15626.
C. Batch lane count R=2048 (Kw=512, kwt=128): correctness + timing.
D. Z64 prove phase profile (5k mul).
E. 1M-gate end-to-end: pallas-tape prove (proof bytes == XLA-tape proof),
   steady prove/verify with the packed-injection verify path.
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

from reverie_tpu.crypto import expand_seeds
from reverie_tpu.crypto.kernels import aes_jax as aj
from reverie_tpu.crypto.kernels.aes_pallas import aes_ctr_tape_gf2_pallas
from reverie_tpu.backend.tpu_host import build_tapes


def log(*a):
    print(*a, flush=True)


def part_a():
    dev = jax.devices()[0]
    for nbytes in (4096, 1 << 20, 10 << 20, 100 << 20):
        x = np.random.randint(0, 256, nbytes, dtype=np.uint8)
        t0 = time.time()
        d = jax.device_put(x, dev)
        d.block_until_ready()
        t_up = time.time() - t0
        t0 = time.time()
        _ = np.asarray(d)
        t_dn = time.time() - t0
        log(f"[A] {nbytes>>10} KiB: H2D {t_up*1e3:.1f} ms ({nbytes/t_up/1e6:.0f} MB/s), "
            f"D2H {t_dn*1e3:.1f} ms ({nbytes/t_dn/1e6:.0f} MB/s)")
    # per-call latency: 20 tiny pulls
    d = jax.device_put(np.zeros(8, np.uint8), dev)
    d.block_until_ready()
    t0 = time.time()
    for _ in range(20):
        _ = np.asarray(d)
    log(f"[A] tiny pull latency: {(time.time()-t0)/20*1e3:.1f} ms/call")
    f = jax.jit(lambda x: x + 1)
    _ = f(d).block_until_ready()
    t0 = time.time()
    for _ in range(20):
        _ = f(d).block_until_ready()
    log(f"[A] tiny jit roundtrip: {(time.time()-t0)/20*1e3:.1f} ms/call")


def keys(R, seed=42):
    rng = np.random.RandomState(seed)
    seeds = rng.randint(0, 256, size=(R, 16), dtype=np.uint8)
    return expand_seeds(seeds).reshape(R, 8, 16)


def part_b():
    R, B = 256, 15626
    pk = keys(R)
    rkp = jnp.asarray(aj.round_key_planes(pk.reshape(-1, 16)))
    mask = jnp.asarray(np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32))
    for tb in (32, 64, 128, 256):
        try:
            fn = jax.jit(aes_ctr_tape_gf2_pallas, static_argnums=(1, 3))
            t0 = time.time()
            out = fn(rkp, B, mask, tb)
            out.block_until_ready()
            warm = time.time() - t0
            t0 = time.time()
            out = fn(rkp, B, mask, tb)
            out.block_until_ready()
            log(f"[B] tile_b={tb}: steady {time.time()-t0:.3f}s (warm {warm:.0f}s)")
        except Exception as e:  # noqa: BLE001
            log(f"[B] tile_b={tb}: FAILED {type(e).__name__}: {e}")


def part_c():
    R, B = 2048, 512
    pk = keys(R)
    rkp = jnp.asarray(aj.round_key_planes(pk.reshape(-1, 16)))
    mask = jnp.asarray(np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32))
    m2 = B * 128
    golden, _, _ = build_tapes(pk, None, m2, 0)
    fn = jax.jit(aes_ctr_tape_gf2_pallas, static_argnums=(1,))
    t0 = time.time()
    tape = np.asarray(fn(rkp, B, mask))[:m2]
    warm = time.time() - t0
    ok = np.array_equal(tape, golden)
    t0 = time.time()
    fn(rkp, B, mask).block_until_ready()
    log(f"[C] R=2048 B=512 kwt=128: {'OK' if ok else 'DIVERGE'} "
        f"(warm {warm:.0f}s, steady {time.time()-t0:.3f}s)")


def part_d():
    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.circuit.builders import z64_mul_bench_circuit

    prog, wit2, witz = z64_mul_bench_circuit(5000)
    s = TpuKKW(prog)
    seeds = np.random.RandomState(0).randint(0, 256, size=(256, 16), dtype=np.uint8)
    t0 = time.time(); p = s.prove(wit2, witz, seeds=seeds)
    log(f"[D] z64 5k warmup prove {time.time()-t0:.1f}s")
    t0 = time.time(); p = s.prove(wit2, witz, seeds=seeds)
    log(f"[D] z64 5k steady prove {time.time()-t0:.3f}s")
    t0 = time.time(); ok = s.verify(p)
    log(f"[D] z64 warmup verify {time.time()-t0:.1f}s ok={ok}")
    t0 = time.time(); ok = s.verify(p)
    log(f"[D] z64 steady verify {time.time()-t0:.3f}s ok={ok}")


def part_e():
    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.circuit.builders import mul_bench_circuit

    n = int(os.environ.get("BENCH_GATES", 1_000_000))
    prog, wit2, witz = mul_bench_circuit(n)
    seeds = np.random.RandomState(0).randint(0, 256, size=(256, 16), dtype=np.uint8)

    os.environ["REVERIE_PALLAS_MAX_B"] = "0"  # force XLA tape kernel
    s1 = TpuKKW(prog)
    p_xla = s1.prove(wit2, witz, seeds=seeds)
    del s1

    os.environ["REVERIE_PALLAS_MAX_B"] = "100000"
    s2 = TpuKKW(prog)
    t0 = time.time()
    p_pal = s2.prove(wit2, witz, seeds=seeds)
    log(f"[E] pallas-path warmup prove {time.time()-t0:.1f}s")
    log(f"[E] proof bytes pallas==xla: {p_pal.to_bytes() == p_xla.to_bytes()}")
    for i in range(2):
        t0 = time.time()
        p_pal = s2.prove(wit2, witz, seeds=seeds)
        log(f"[E] steady prove #{i} {time.time()-t0:.3f}s")
    t0 = time.time()
    ok = s2.verify(p_pal)
    log(f"[E] warmup verify {time.time()-t0:.1f}s ok={ok}")
    for i in range(2):
        t0 = time.time()
        ok = s2.verify(p_pal)
        log(f"[E] steady verify #{i} {time.time()-t0:.3f}s ok={ok}")


if __name__ == "__main__":
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    for part in (part_a, part_b, part_c, part_d, part_e):
        try:
            part()
        except Exception as e:  # noqa: BLE001
            import traceback
            traceback.print_exc()
            log(f"{part.__name__} FAILED: {e!r}")
    log("r2_tune done")
