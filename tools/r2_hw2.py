"""Hardware validation + timing for the Pallas BLAKE3 chunk-CV kernel.

A. Differential: hash_columns with/without the Pallas bulk-CV path at
   transcript-sized inputs (n_chunks ~ 250 and ~15k), bytes must match.
B. Kernel timing: XLA vs Pallas bulk CVs at 1M-gate stream sizes.
C. End-to-end: 1M-gate prove with Pallas blake3, proof bytes vs the
   REVERIE_NO_PALLAS=... reference path run in part A of tools/r2_hw.py
   (regenerated here with the XLA hash for self-containment).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("REVERIE_PALLAS_BLAKE3", "1")  # validate the opt-in path

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, flush=True)


def part_a():
    from reverie_tpu.crypto.kernels import blake3_jax as bj

    rng = np.random.RandomState(0)
    for T in (260_000, 1_000_000):
        buf = jnp.asarray(rng.randint(0, 256, size=(T, 256), dtype=np.uint8))
        os.environ["REVERIE_NO_PALLAS"] = "1"
        x = np.asarray(jax.jit(bj.hash_columns, static_argnums=1)(buf, T))
        del os.environ["REVERIE_NO_PALLAS"]
        p = np.asarray(jax.jit(lambda b: bj.hash_columns(b, T))(buf))
        log(f"[A] T={T}: pallas==xla {np.array_equal(x, p)}")


def part_b():
    from reverie_tpu.crypto.kernels import blake3_jax as bj
    from reverie_tpu.crypto.kernels.blake3_pallas import chunk_cvs_pallas

    rng = np.random.RandomState(1)
    n, R = 976, 256  # ~1M-byte stream per rep
    words = jnp.asarray(
        rng.randint(0, 1 << 32, size=(n, 16, 16, R), dtype=np.uint64).astype(np.uint32)
    )
    fx = jax.jit(lambda w: bj._chunk_cvs(w, 16, np.full(16, 64, np.uint32),
                                         jnp.arange(n, dtype=jnp.uint32)))
    fp = jax.jit(lambda w: chunk_cvs_pallas(w, 0))
    for name, f in (("xla", fx), ("pallas", fp)):
        out = f(words); jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(3):
            out = f(words)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 3
        gb = n * 1024 * R / 1e9
        log(f"[B] {name}: {dt*1e3:.1f} ms for {gb:.2f} GB -> {gb/dt:.0f} GB/s")


def part_c():
    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.circuit.builders import mul_bench_circuit

    seeds = np.random.RandomState(42).randint(0, 256, size=(256, 16), dtype=np.uint8)
    prog, wit2, witz = mul_bench_circuit(1_000_000)

    os.environ["REVERIE_NO_PALLAS"] = "1"
    s1 = TpuKKW(prog)
    p_ref = s1.prove(wit2, witz, seeds=seeds)
    del s1, os.environ["REVERIE_NO_PALLAS"]

    s2 = TpuKKW(prog)
    t0 = time.time()
    p = s2.prove(wit2, witz, seeds=seeds)
    log(f"[C] warmup {time.time()-t0:.1f}s bytes_match={p.to_bytes() == p_ref.to_bytes()}")
    best = float("inf")
    for i in range(3):
        t0 = time.time()
        p = s2.prove(wit2, witz, seeds=seeds)
        best = min(best, time.time() - t0)
    log(f"[C] steady prove best {best:.3f}s = {1/best:.2f}M gates/s")
    t0 = time.time(); ok = s2.verify(p)
    log(f"[C] warmup verify {time.time()-t0:.1f}s ok={ok}")
    t0 = time.time(); ok = s2.verify(p)
    log(f"[C] steady verify {time.time()-t0:.3f}s ok={ok}")


if __name__ == "__main__":
    log(f"backend: {jax.default_backend()}")
    os.environ["REVERIE_PROFILE"] = "1"
    for part in (part_a, part_b, part_c):
        try:
            part()
        except Exception as e:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            log(f"{part.__name__} FAILED: {e!r}")
    log("r2_hw2 done")
