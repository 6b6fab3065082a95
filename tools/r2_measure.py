"""Round-2 measurement batch (one TPU process, run in background):

A. Pallas AES divergence triage beyond 4096 blocks:
   - pallas *planes* kernel output + NumPy post-processing vs host AES golden
   - full jitted pallas *tape* (kernel + XLA post) vs host AES golden
   Localizes the known axon miscompile: kernel itself vs surrounding fusion.
B. 1M-gate phase profiles: prove (warmup + 2 steady), verify (warmup + 2
   steady) with REVERIE_PROFILE=1 phase breakdowns on stderr.
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
from reverie_tpu.crypto.kernels.aes_pallas import (
    aes_ctr_planes_pallas,
    aes_ctr_tape_gf2_pallas,
)
from reverie_tpu.backend.tpu_host import build_tapes


def log(*a):
    print(*a, flush=True)


def numpy_post(planes: np.ndarray, B: int) -> np.ndarray:
    """Replicate aes_ctr_tape_gf2_pallas post-processing in NumPy.
    planes: (16, 8, Bp, Kw) u32 -> (B*128, Kw*4) uint8 tape."""
    Kw = planes.shape[-1]
    p = planes[:, ::-1, :B]  # (16, 8, B, Kw)
    words = np.transpose(p, (2, 0, 1, 3)).reshape(B * 128, Kw).astype(np.uint32)
    m1, m2_, m4 = np.uint32(0x55555555), np.uint32(0x33333333), np.uint32(0x0F0F0F0F)
    words = ((words & m1) << np.uint32(1)) | ((words >> np.uint32(1)) & m1)
    words = ((words & m2_) << np.uint32(2)) | ((words >> np.uint32(2)) & m2_)
    words = ((words & m4) << np.uint32(4)) | ((words >> np.uint32(4)) & m4)
    return np.ascontiguousarray(words).view(np.uint8).reshape(B * 128, Kw * 4)


def first_mismatch(a: np.ndarray, b: np.ndarray):
    if a.shape != b.shape:
        return f"shape {a.shape} vs {b.shape}"
    neq = a != b
    if not neq.any():
        return None
    idx = np.argwhere(neq)
    frac = neq.mean()
    return f"first={idx[0].tolist()} last={idx[-1].tolist()} frac={frac:.4f}"


def part_a():
    R = 256
    rng = np.random.RandomState(42)
    seeds = rng.randint(0, 256, size=(R, 16), dtype=np.uint8)
    player_keys = expand_seeds(seeds).reshape(R, 8, 16)
    rkp = aj.round_key_planes(player_keys.reshape(-1, 16))
    mask = np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32)

    Bmax = 15626
    t0 = time.time()
    golden_full, _, _ = build_tapes(player_keys, None, Bmax * 128, 0)  # (m2, R)
    log(f"[A] host golden tape ({Bmax} blocks) in {time.time()-t0:.1f}s")

    jrkp = jnp.asarray(rkp)
    jmask = jnp.asarray(mask)
    for B in (4096, 4128, 8192, 15626):
        m2 = B * 128
        golden = golden_full[:m2]
        Bp = ((B + 31) // 32) * 32
        try:
            t0 = time.time()
            planes = np.asarray(
                jax.jit(aes_ctr_planes_pallas, static_argnums=(1, 2))(jrkp, Bp, 32)
            )
            t_planes = time.time() - t0
            tape_np = numpy_post(planes, B)
            d1 = first_mismatch(tape_np, golden)
            log(f"[A] B={B}: planes+numpy-post vs golden: "
                f"{'OK' if d1 is None else 'DIVERGE ' + d1} ({t_planes:.1f}s)")
        except Exception as e:  # noqa: BLE001
            log(f"[A] B={B}: planes path FAILED: {e!r}")
        try:
            t0 = time.time()
            tape_dev = np.asarray(
                jax.jit(aes_ctr_tape_gf2_pallas, static_argnums=(1,))(jrkp, B, jmask)
            )[:m2]
            t_tape = time.time() - t0
            d2 = first_mismatch(tape_dev, golden)
            log(f"[A] B={B}: fused pallas tape vs golden: "
                f"{'OK' if d2 is None else 'DIVERGE ' + d2} ({t_tape:.1f}s)")
        except Exception as e:  # noqa: BLE001
            log(f"[A] B={B}: fused tape path FAILED: {e!r}")


def part_b():
    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.circuit.builders import mul_bench_circuit

    n = int(os.environ.get("BENCH_GATES", 1_000_000))
    prog, wit2, witz = mul_bench_circuit(n)
    s = TpuKKW(prog)
    seeds = np.random.RandomState(0).randint(0, 256, size=(256, 16), dtype=np.uint8)
    t0 = time.time(); proof = s.prove(wit2, witz, seeds=seeds)
    log(f"[B] warmup prove {time.time()-t0:.1f}s")
    for i in range(2):
        t0 = time.time(); proof = s.prove(wit2, witz, seeds=seeds)
        log(f"[B] steady prove #{i} {time.time()-t0:.3f}s")
    t0 = time.time(); ok = s.verify(proof)
    log(f"[B] warmup verify {time.time()-t0:.1f}s ok={ok}")
    for i in range(2):
        t0 = time.time(); ok = s.verify(proof)
        log(f"[B] steady verify #{i} {time.time()-t0:.3f}s ok={ok}")


if __name__ == "__main__":
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    part_a()
    part_b()
    log("r2_measure done")
