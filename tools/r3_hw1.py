"""Round-3 hardware battery 1: SHA-256 deep/scan path + z64 device roofline.

Parts (argv selects, default all):
  sha1    -- SHA-256 single-proof latency (scan executor, new u16 fast path)
  batch   -- SHA-256 prove_batch N=8/16/64 (+ N=256 chunked via repeat runs)
  z64     -- 50k-mul z64 prove with REVERIE_PROFILE phase breakdown
             (VERDICT item 10: device-only z64 roofline entry)

Run on the axon TPU; one process holds the chip.
"""

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def setup():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")


def sha256_system():
    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.circuit.sha256 import (
        block_to_witness_bits,
        sha256_pad_one_block,
        sha256_preimage_statement,
    )

    msg = b"reverie-tpu round 3"
    prog, _ = sha256_preimage_statement(hashlib.sha256(msg).digest())
    wit = block_to_witness_bits(sha256_pad_one_block(msg))
    t0 = time.time()
    sys_ = TpuKKW(prog)
    log(f"sha256 compile {time.time()-t0:.1f}s depth={sys_.cc.depth}")
    return sys_, wit


def part_sha1():
    sys_, wit = sha256_system()
    rng = np.random.RandomState(7)
    seeds = rng.randint(0, 256, size=(256, 16), dtype=np.uint8)
    t0 = time.time()
    proof = sys_.prove(wit, [], seeds=seeds)
    log(f"sha256 warmup prove {time.time()-t0:.1f}s")
    best = float("inf")
    for i in range(4):
        t0 = time.time()
        proof = sys_.prove(wit, [], seeds=seeds)
        dt = time.time() - t0
        log(f"  prove #{i}: {dt:.3f}s")
        best = min(best, dt)
    t0 = time.time()
    ok = sys_.verify(proof)
    log(f"  verify warm {time.time()-t0:.2f}s ok={ok}")
    t0 = time.time()
    ok = sys_.verify(proof) and ok
    vt = time.time() - t0
    print(json.dumps({"part": "sha256_single", "prove_s": round(best, 4),
                      "verify_s": round(vt, 4), "ok": bool(ok),
                      "proof_bytes": len(proof.to_bytes())}))
    return sys_, wit


def part_batch(sys_=None, wit=None):
    if sys_ is None:
        sys_, wit = sha256_system()
    rng = np.random.RandomState(11)
    for N in (8, 16, 64):
        seeds = rng.randint(0, 256, size=(N, 256, 16), dtype=np.uint8)
        wits = [(wit, [])] * N
        try:
            t0 = time.time()
            proofs = sys_.prove_batch(wits, seeds=seeds)
            warm = time.time() - t0
            best = float("inf")
            for i in range(2):
                t0 = time.time()
                proofs = sys_.prove_batch(wits, seeds=seeds)
                dt = time.time() - t0
                log(f"  N={N} #{i}: {dt:.2f}s = {N/dt:.1f} proofs/s")
                best = min(best, dt)
            ok = sys_.verify(proofs[0])
            print(json.dumps({"part": f"sha256_batch{N}", "warm_s": round(warm, 2),
                              "s_per_batch": round(best, 3),
                              "proofs_per_s": round(N / best, 2), "ok": bool(ok)}))
        except Exception as e:
            print(json.dumps({"part": f"sha256_batch{N}", "error": str(e)[:200]}))
            break


def part_chunk(sys_=None, wit=None):
    """config 5: large batches through prove_batch_chunked (chunk=64 device
    batches pipelined; N=64 compile shared)."""
    if sys_ is None:
        sys_, wit = sha256_system()
    rng = np.random.RandomState(13)
    for N in (256, 1024):
        seeds = rng.randint(0, 256, size=(N, 256, 16), dtype=np.uint8)
        wits = [(wit, [])] * N
        t0 = time.time()
        proofs = sys_.prove_batch_chunked(wits, seeds=seeds, chunk=64)
        dt = time.time() - t0
        ok = sys_.verify(proofs[0]) and sys_.verify(proofs[-1])
        log(f"  chunked N={N}: {dt:.2f}s = {N/dt:.1f} proofs/s ok={ok}")
        print(json.dumps({"part": f"sha256_chunked{N}", "total_s": round(dt, 2),
                          "proofs_per_s": round(N / dt, 2), "ok": bool(ok)}))


def part_z64():
    os.environ["REVERIE_PROFILE"] = "1"
    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.circuit.builders import z64_mul_bench_circuit

    prog, wit2, witz = z64_mul_bench_circuit(50_000)
    sys_ = TpuKKW(prog)
    rng = np.random.RandomState(5)
    seeds = rng.randint(0, 256, size=(256, 16), dtype=np.uint8)
    t0 = time.time()
    proof = sys_.prove(wit2, witz, seeds=seeds)
    log(f"z64 warmup {time.time()-t0:.1f}s")
    best = float("inf")
    for i in range(3):
        t0 = time.time()
        proof = sys_.prove(wit2, witz, seeds=seeds)
        dt = time.time() - t0
        log(f"  z64 prove #{i}: {dt:.2f}s")
        best = min(best, dt)
    print(json.dumps({"part": "z64_50k", "prove_s": round(best, 3),
                      "gates_per_s": round(50_000 / best),
                      "proof_bytes": len(proof.to_bytes())}))
    os.environ.pop("REVERIE_PROFILE", None)


def main():
    setup()
    parts = sys.argv[1:] or ["sha1", "batch", "chunk", "z64"]
    ctx = None
    if "sha1" in parts:
        ctx = part_sha1()
    if "batch" in parts:
        part_batch(*(ctx or (None, None)))
    if "chunk" in parts:
        part_chunk(*(ctx or (None, None)))
    if "z64" in parts:
        part_z64()


if __name__ == "__main__":
    main()
