"""Round-2 continuation #3 (single TPU process) -- queued HW battery:

4. AES tape kernel variants (unrolled rounds x tile_b sweep)
1. blake3 hash_columns microbench (16-var compress vs previous 0.065 s at
   the 1M-prove transcript shape) + 1M prove phase profile + prove_many
3. prove_batch N=8/N=16 re-verify
2. 16M-gate streamed prove + streamed verify (re-measure after round-2b
   deferred pulls + Pallas start-block windows)

Then run the round-2c capability benches (scan executor z64/B2A + deep
streaming):  python bench_suite.py z64_deep sha256_long
And the headline:  python bench.py   (writes .bench_last_measured.json)
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


def part1_blake3_and_prove():
    log("== part 1: blake3 microbench + 1M prove ==")
    from reverie_tpu.crypto.kernels import blake3_jax as bj

    R, T = 256, 2_000_002
    rng = np.random.RandomState(0)
    buf = jnp.asarray(rng.randint(0, 256, size=(T + 62, R), dtype=np.uint8))
    f = jax.jit(lambda b: bj.hash_columns(b, T))
    t0 = time.time()
    jax.block_until_ready(f(buf))
    log(f"hash_columns warm {time.time()-t0:.1f}s")
    for it in range(3):
        t0 = time.time()
        jax.block_until_ready(f(buf))
        dt = time.time() - t0
        log(f"hash_columns (T={T}, R={R}) #{it}: {dt*1e3:.1f}ms = "
            f"{T*R/1e9/dt:.1f} GB/s")

    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.circuit.builders import mul_bench_circuit

    prog, wit2, witz = mul_bench_circuit(1_000_000)
    sys_ = TpuKKW(prog)
    seeds = np.random.RandomState(0).randint(0, 256, size=(4, 256, 16), dtype=np.uint8)
    t0 = time.time()
    proof = sys_.prove(wit2, witz, seeds=seeds[0])
    log(f"1M warm {time.time()-t0:.1f}s")
    for it in range(2):
        t0 = time.time()
        proof = sys_.prove(wit2, witz, seeds=seeds[0])
        dt = time.time() - t0
        log(f"1M steady#{it} {dt:.3f}s -> {1e6/dt/1e6:.2f}M gates/s")
    os.environ.pop("REVERIE_PROFILE", None)
    jobs = [(wit2, witz)] * 4
    for it in range(2):
        t0 = time.time()
        proofs = sys_.prove_many(jobs, seeds=seeds)
        dt = time.time() - t0
        log(f"prove_many x4 #{it}: {dt:.3f}s -> {4e6/dt/1e6:.2f}M gates/s")
    assert proofs[0].to_bytes() == proof.to_bytes()
    t0 = time.time()
    ok = sys_.verify(proof)
    log(f"verify warm {time.time()-t0:.1f}s ok={ok}")
    t0 = time.time()
    ok = sys_.verify(proof)
    log(f"verify steady {time.time()-t0:.2f}s ok={ok}")
    os.environ["REVERIE_PROFILE"] = "1"


def part3_batch():
    log("== part 3: prove_batch N=8/N=16 re-verify ==")
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
        log(f"N={N} warm {time.time()-t0:.1f}s")
        for it in range(2):
            t0 = time.time()
            proofs = sys_.prove_batch(wits, seeds=seeds)
            dt = time.time() - t0
            log(f"N={N} steady#{it} {dt:.2f}s -> {N/dt:.1f} proofs/s")
        ok = sys_.verify(proofs[0])
        log(f"N={N} verify[0] ok={ok}")


def part2_streaming16m():
    log("== part 2: 16M streamed prove + verify ==")
    from reverie_tpu.backend.streaming import StreamingKKW
    from reverie_tpu.circuit.builders import mul_bench_circuit

    n = int(os.environ.get("STREAM_GATES", 16_000_000))
    t0 = time.time()
    prog, wit2, witz = mul_bench_circuit(n)
    log(f"built {n} gates in {time.time()-t0:.1f}s")
    sk = StreamingKKW(prog, 1 << 21)
    log(f"segments: {len(sk.segments)}")
    seeds = np.random.RandomState(5).randint(0, 256, size=(256, 16), dtype=np.uint8)
    t0 = time.time()
    proof = sk.prove(wit2, witz, seeds=seeds)
    log(f"streamed prove warm {time.time()-t0:.1f}s")
    t0 = time.time()
    proof = sk.prove(wit2, witz, seeds=seeds)
    dt = time.time() - t0
    log(f"streamed prove steady {dt:.1f}s -> {n/dt/1e6:.2f}M gates/s, "
        f"proof {len(proof.to_bytes())/1e6:.0f} MB")
    t0 = time.time()
    ok = sk.verify(proof)
    log(f"streamed verify warm {time.time()-t0:.1f}s ok={ok}")
    t0 = time.time()
    ok = sk.verify(proof)
    log(f"streamed verify steady {time.time()-t0:.1f}s ok={ok}")


def part4_aes_variants():
    log("== part 4: AES tape kernel variants (unroll x tile_b) ==")
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
    for unroll in (False, True):
        for tb in (32, 64, 128):
            f = jax.jit(aes_ctr_tape_gf2_pallas, static_argnums=(1, 4, 5, 6, 7))
            try:
                t0 = time.time()
                out = f(rkp, B, mask, 0, tb, 64, False, unroll)
                jax.block_until_ready(out)
                warm = time.time() - t0
                times = []
                for _ in range(3):
                    t0 = time.time()
                    jax.block_until_ready(f(rkp, B, mask, 0, tb, 64, False, unroll))
                    times.append(time.time() - t0)
                dt = min(times)
                if ref is None:
                    ref = out
                    eq = "ref"
                else:
                    eq = "ok" if int(jax.jit(lambda a, b: (a != b).sum())(out, ref)) == 0 else "DIVERGE"
                log(f"unroll={unroll} tile_b={tb}: best {dt*1e3:.0f}ms "
                    f"({B*16*2048/1e9/dt:.1f} GB/s) warm {warm:.1f}s [{eq}]")
            except Exception as e:
                log(f"unroll={unroll} tile_b={tb}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    parts = sys.argv[1:] or ["4", "1", "3", "2"]
    if "4" in parts:
        part4_aes_variants()
    if "1" in parts:
        part1_blake3_and_prove()
    if "3" in parts:
        part3_batch()
    if "2" in parts:
        part2_streaming16m()
