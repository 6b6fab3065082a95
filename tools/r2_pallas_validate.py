"""Round-2 hardware validation of the fused Pallas AES tape kernel.

A. Fused tape vs host golden at B=15626 (the 1M-gate size that diverged
   with the old XLA post-processing), R=256.
B. Fused tape vs host golden at batch lane count R=2048 (Kw=512, grid over
   tile_kw=64), moderate B.
C. Timing: fused pallas vs XLA kernel at B=15626.
D. End-to-end 1M prove with REVERIE_PALLAS_MAX_B=100000: proof bytes must
   equal the XLA-kernel proof; then steady-state verify.
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


def first_mismatch(a, b):
    if a.shape != b.shape:
        return f"shape {a.shape} vs {b.shape}"
    neq = a != b
    if not neq.any():
        return None
    idx = np.argwhere(neq)
    return f"first={idx[0].tolist()} last={idx[-1].tolist()} frac={neq.mean():.4f}"


def keys(R, seed=42):
    rng = np.random.RandomState(seed)
    seeds = rng.randint(0, 256, size=(R, 16), dtype=np.uint8)
    return expand_seeds(seeds).reshape(R, 8, 16)


def check(R, B, label):
    pk = keys(R)
    rkp = aj.round_key_planes(pk.reshape(-1, 16))
    mask = np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32)
    m2 = B * 128
    t0 = time.time()
    golden, _, _ = build_tapes(pk, None, m2, 0)
    t_gold = time.time() - t0
    log(f"[{label}] R={R} B={B}: golden built ({t_gold:.1f}s); compiling kernel...")
    fn = jax.jit(aes_ctr_tape_gf2_pallas, static_argnums=(1,))
    t0 = time.time()
    tape = np.asarray(fn(jnp.asarray(rkp), B, jnp.asarray(mask)))[:m2]
    t_warm = time.time() - t0
    t0 = time.time()
    out = fn(jnp.asarray(rkp), B, jnp.asarray(mask))
    out.block_until_ready()
    t_steady = time.time() - t0
    d = first_mismatch(tape, golden)
    log(f"[{label}] R={R} B={B}: {'OK' if d is None else 'DIVERGE ' + d}"
        f" (golden {t_gold:.1f}s, warm {t_warm:.1f}s, steady {t_steady:.3f}s)")
    return d is None


def time_xla(R, B):
    pk = keys(R)
    rkp = aj.round_key_planes(pk.reshape(-1, 16))
    mask = np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32)
    fn = jax.jit(aj.aes_ctr_tape_gf2)
    ctrp = aj.counter_planes(B)
    out = fn(jnp.asarray(rkp), jnp.asarray(ctrp), jnp.asarray(mask))
    out.block_until_ready()
    t0 = time.time()
    out = fn(jnp.asarray(rkp), jnp.asarray(ctrp), jnp.asarray(mask))
    out.block_until_ready()
    log(f"[C] XLA kernel R={R} B={B}: steady {time.time()-t0:.3f}s")


def part_d():
    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.circuit.builders import mul_bench_circuit

    n = int(os.environ.get("BENCH_GATES", 1_000_000))
    prog, wit2, witz = mul_bench_circuit(n)
    seeds = np.random.RandomState(0).randint(0, 256, size=(256, 16), dtype=np.uint8)

    os.environ["REVERIE_PALLAS_MAX_B"] = "0"  # force XLA kernel
    s1 = TpuKKW(prog)
    p_xla = s1.prove(wit2, witz, seeds=seeds)
    del s1

    os.environ["REVERIE_PALLAS_MAX_B"] = "100000"
    s2 = TpuKKW(prog)
    t0 = time.time()
    p_pal = s2.prove(wit2, witz, seeds=seeds)
    log(f"[D] pallas-path warmup prove {time.time()-t0:.1f}s")
    match = p_pal.to_bytes() == p_xla.to_bytes()
    log(f"[D] proof bytes pallas==xla: {match}")
    for i in range(2):
        t0 = time.time()
        p_pal = s2.prove(wit2, witz, seeds=seeds)
        log(f"[D] steady prove #{i} {time.time()-t0:.3f}s")
    t0 = time.time()
    ok = s2.verify(p_pal)
    log(f"[D] warmup verify {time.time()-t0:.1f}s ok={ok}")
    t0 = time.time()
    ok = s2.verify(p_pal)
    log(f"[D] steady verify {time.time()-t0:.3f}s ok={ok}")


if __name__ == "__main__":
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    ok = True
    ok &= check(256, 256, "A0")   # small first: fast compile signal
    ok &= check(256, 15626, "A")
    ok &= check(2048, 512, "B")
    if ok:
        time_xla(256, 15626)
        part_d()
    else:
        log("validation FAILED; skipping end-to-end")
    log("r2_pallas_validate done")
