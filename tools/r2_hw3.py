"""Hardware validation: streaming round-2b (Pallas start-block tape windows,
deferred pass-2 pulls, z64/B2A segments, streamed verification).

A. 1M streamed prove: bytes == unsegmented + steady timing.
B. Streamed verify of that proof (+ tamper reject), steady timing.
C. z64 streamed (5k muls): bytes == unsegmented, streamed verify.
D. (STREAM_GATES env, optional) big streamed prove steady timing.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("REVERIE_PROFILE", "1")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from reverie_tpu.backend.streaming import StreamingKKW
from reverie_tpu.backend.tpu_host import TpuKKW
from reverie_tpu.circuit.builders import mul_bench_circuit, z64_mul_bench_circuit
from reverie_tpu.proof.container import Proof


def log(*a):
    print(*a, flush=True)


SEEDS = np.random.RandomState(42).randint(0, 256, size=(256, 16), dtype=np.uint8)


def main():
    log(f"backend: {jax.default_backend()}")

    # ---- A: 1M streamed prove --------------------------------------------
    prog, wit2, witz = mul_bench_circuit(1_000_000)
    p_ref = TpuKKW(prog).prove(wit2, witz, seeds=SEEDS)
    sk = StreamingKKW(prog, 1 << 18)  # 4 segments
    t0 = time.time()
    sp = sk.prove(wit2, witz, seeds=SEEDS)
    log(f"[A] 1M streamed warmup {time.time()-t0:.1f}s "
        f"bytes_match={sp.to_bytes() == p_ref.to_bytes()}")
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        sp = sk.prove(wit2, witz, seeds=SEEDS)
        best = min(best, time.time() - t0)
    log(f"[A] 1M streamed steady best {best:.3f}s = {1/best:.2f}M gates/s")

    # ---- B: streamed verify ----------------------------------------------
    t0 = time.time()
    ok = sk.verify(sp)
    log(f"[B] streamed verify warmup {time.time()-t0:.1f}s ok={ok}")
    t0 = time.time()
    ok = sk.verify(sp)
    log(f"[B] streamed verify steady {time.time()-t0:.3f}s ok={ok}")
    raw = bytearray(sp.to_bytes())
    raw[len(raw) // 2] ^= 0x40
    log(f"[B] tamper reject ok={not sk.verify(Proof.from_bytes(bytes(raw)))}")
    del sk, sp, prog

    # ---- C: z64 streamed --------------------------------------------------
    prog, wit2, witz = z64_mul_bench_circuit(5000)
    pz_ref = TpuKKW(prog).prove(wit2, witz, seeds=SEEDS)
    skz = StreamingKKW(prog, 1400)
    t0 = time.time()
    pz = skz.prove(wit2, witz, seeds=SEEDS)
    log(f"[C] z64 5k streamed ({len(skz.segments)} segs) warmup "
        f"{time.time()-t0:.1f}s bytes_match={pz.to_bytes() == pz_ref.to_bytes()}")
    t0 = time.time()
    pz = skz.prove(wit2, witz, seeds=SEEDS)
    log(f"[C] z64 5k streamed steady {time.time()-t0:.3f}s")
    t0 = time.time()
    ok = skz.verify(pz)
    log(f"[C] z64 streamed verify warmup {time.time()-t0:.1f}s ok={ok}")
    t0 = time.time()
    ok = skz.verify(pz)
    log(f"[C] z64 streamed verify steady {time.time()-t0:.3f}s ok={ok}")
    del skz, pz, prog

    # ---- D: big streamed prove (optional) ---------------------------------
    n = int(os.environ.get("STREAM_GATES", 0))
    if n:
        t0 = time.time()
        prog, wit2, witz = mul_bench_circuit(n)
        log(f"[D] {n} op list built in {time.time()-t0:.0f}s")
        t0 = time.time()
        sk = StreamingKKW(prog, 1 << 21)
        log(f"[D] compiled into {len(sk.segments)} segments in {time.time()-t0:.0f}s")
        t0 = time.time()
        sp = sk.prove(wit2, witz, seeds=SEEDS)
        log(f"[D] {n} streamed prove warm {time.time()-t0:.1f}s "
            f"proof {len(sp.to_bytes())} B")
        t0 = time.time()
        sp = sk.prove(wit2, witz, seeds=SEEDS)
        dt = time.time() - t0
        log(f"[D] {n} streamed prove steady {dt:.1f}s = {n/dt/1e6:.2f}M gates/s")
        t0 = time.time()
        ok = sk.verify(sp)
        log(f"[D] {n} streamed verify warm {time.time()-t0:.1f}s ok={ok}")
        t0 = time.time()
        ok = sk.verify(sp)
        log(f"[D] {n} streamed verify steady {time.time()-t0:.1f}s ok={ok}")

    log("r2_hw3 done")


if __name__ == "__main__":
    main()
