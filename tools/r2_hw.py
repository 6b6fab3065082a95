"""Round-2 hardware validation + measurement batch (single TPU process).

A. Golden checks: 6 circuit classes, proof bytes vs CPU-golden pickles
   (run tools/make_goldens.py under JAX_PLATFORMS=cpu first).
B. Z64 throughput: 5k and 50k muls, steady prove/verify (device extractor +
   chunked tape kernel).
C. 1M-gate AND bench: steady prove/verify x3 (fused Pallas tape default).
D. Streaming: 1M streamed proof bytes == unsegmented (hardware carry/absorb
   validation), then a 16M-gate streamed prove (beyond-HBM milestone).
E. Batch proving: N=8 and N=16 SHA-256 (R%256==0 Pallas lanes).
"""
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("REVERIE_PROFILE", "1")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from reverie_tpu.backend.tpu_host import TpuKKW
from reverie_tpu.circuit.builders import (
    mixed_b2a_circuit,
    mul_bench_circuit,
    wide_and_circuit,
    z64_mul_bench_circuit,
)


def log(*a):
    print(*a, flush=True)


SEEDS = np.random.RandomState(42).randint(0, 256, size=(256, 16), dtype=np.uint8)


def part_a():
    golden = {}
    if os.path.exists("/tmp/golden_proofs.pkl"):
        golden = pickle.load(open("/tmp/golden_proofs.pkl", "rb"))
    for name, (prog, wit2, witz) in [
        ("mul20", mul_bench_circuit(20)),
        ("wide_and", wide_and_circuit(50, width=32, seed=7)),
        ("b2a", mixed_b2a_circuit()),
        ("deep_scan", wide_and_circuit(700, width=8, seed=11)),
        ("aes_dev", mul_bench_circuit(2500)),
        ("z64_dev", z64_mul_bench_circuit(300)),
    ]:
        s_ = TpuKKW(prog)
        proof = s_.prove(wit2, witz, seeds=SEEDS)
        ok = s_.verify(proof)
        gm = (golden.get(name) == proof.to_bytes()) if name in golden else "n/a"
        log(f"[A] {name}: verify={ok} golden_match={gm}")
        del s_


def part_b():
    for n in (5000, 50000):
        prog, wit2, witz = z64_mul_bench_circuit(n)
        s_ = TpuKKW(prog)
        t0 = time.time(); p = s_.prove(wit2, witz, seeds=SEEDS)
        log(f"[B] z64 {n}: warmup prove {time.time()-t0:.1f}s")
        t0 = time.time(); p = s_.prove(wit2, witz, seeds=SEEDS)
        dt = time.time() - t0
        log(f"[B] z64 {n}: steady prove {dt:.3f}s = {n/dt:.0f} gates/s")
        t0 = time.time(); ok = s_.verify(p)
        log(f"[B] z64 {n}: warmup verify {time.time()-t0:.1f}s ok={ok}")
        t0 = time.time(); ok = s_.verify(p)
        log(f"[B] z64 {n}: steady verify {time.time()-t0:.3f}s ok={ok}")
        del s_


def part_c():
    prog, wit2, witz = mul_bench_circuit(1_000_000)
    s_ = TpuKKW(prog)
    t0 = time.time(); p = s_.prove(wit2, witz, seeds=SEEDS)
    log(f"[C] 1M: warmup prove {time.time()-t0:.1f}s")
    for i in range(3):
        t0 = time.time(); p = s_.prove(wit2, witz, seeds=SEEDS)
        dt = time.time() - t0
        log(f"[C] 1M: steady prove #{i} {dt:.3f}s = {1e6/dt/1e6:.2f}M gates/s")
    t0 = time.time(); ok = s_.verify(p)
    log(f"[C] 1M: warmup verify {time.time()-t0:.1f}s ok={ok}")
    for i in range(2):
        t0 = time.time(); ok = s_.verify(p)
        log(f"[C] 1M: steady verify #{i} {time.time()-t0:.3f}s ok={ok}")
    del s_
    return p


def part_d(p_1m):
    from reverie_tpu.backend.streaming import StreamingKKW

    prog, wit2, witz = mul_bench_circuit(1_000_000)
    sk = StreamingKKW(prog, 1 << 18)  # 4 segments
    t0 = time.time()
    sp = sk.prove(wit2, witz, seeds=SEEDS)
    log(f"[D] 1M streamed: warmup {time.time()-t0:.1f}s "
        f"bytes_match={sp.to_bytes() == p_1m.to_bytes()}")
    t0 = time.time()
    sp = sk.prove(wit2, witz, seeds=SEEDS)
    log(f"[D] 1M streamed: steady {time.time()-t0:.3f}s")
    del sk, sp, prog

    n = int(os.environ.get("STREAM_GATES", 16_000_000))
    t0 = time.time()
    prog, wit2, witz = mul_bench_circuit(n)
    log(f"[D] {n} op list built in {time.time()-t0:.0f}s")
    t0 = time.time()
    sk = StreamingKKW(prog, 1 << 21)
    log(f"[D] {n} compiled into {len(sk.segments)} segments in {time.time()-t0:.0f}s")
    t0 = time.time()
    sp = sk.prove(wit2, witz, seeds=SEEDS)
    dt = time.time() - t0
    log(f"[D] {n} streamed prove (warm incl. compile) {dt:.1f}s, "
        f"proof {len(sp.to_bytes())} B")
    t0 = time.time()
    sp = sk.prove(wit2, witz, seeds=SEEDS)
    dt = time.time() - t0
    log(f"[D] {n} streamed prove steady {dt:.1f}s = {n/dt/1e6:.2f}M gates/s")
    del sk, sp, prog


def part_e():
    import hashlib

    from reverie_tpu.circuit.sha256 import (
        block_to_witness_bits,
        sha256_pad_one_block,
        sha256_preimage_statement,
    )

    msg = b"reverie_tpu round2"
    prog, _ = sha256_preimage_statement(hashlib.sha256(msg).digest())
    wit = block_to_witness_bits(sha256_pad_one_block(msg))
    for N in (8, 16):
        s_ = TpuKKW(prog)
        wits = [(wit, [])] * N
        seeds = np.random.RandomState(1).randint(
            0, 256, size=(N, 256, 16), dtype=np.uint8
        )
        try:
            t0 = time.time(); proofs = s_.prove_batch(wits, seeds=seeds)
            warm = time.time() - t0
            t0 = time.time(); proofs = s_.prove_batch(wits, seeds=seeds)
            dt = time.time() - t0
            ok = s_.verify(proofs[0]) and s_.verify(proofs[-1])
            log(f"[E] batch N={N}: steady {dt:.3f}s = {N/dt:.1f} proofs/s "
                f"(warm {warm:.0f}s) verify={ok}")
        except Exception as e:  # noqa: BLE001
            log(f"[E] batch N={N}: FAILED {type(e).__name__}: {e}")
        del s_


if __name__ == "__main__":
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    only = sys.argv[1:] or ["a", "b", "c", "d", "e"]
    p_1m = None
    for name in only:
        t0 = time.time()
        try:
            if name == "a":
                part_a()
            elif name == "b":
                part_b()
            elif name == "c":
                p_1m = part_c()
            elif name == "d":
                if p_1m is None:
                    prog, wit2, witz = mul_bench_circuit(1_000_000)
                    p_1m = TpuKKW(prog).prove(wit2, witz, seeds=SEEDS)
                part_d(p_1m)
            elif name == "e":
                part_e()
        except Exception as e:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            log(f"part {name} FAILED: {e!r}")
        log(f"-- part {name} done in {time.time()-t0:.0f}s")
    log("r2_hw done")
