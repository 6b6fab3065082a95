"""Headline benchmark: AND gates/sec proving (Z2), all 256 repetitions.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Phase timings go to stderr.

Circuit: the reference's prover-bench shape (proof/mod.rs:322-335) scaled to
N AND gates.  vs_baseline compares against the reference's estimated AVX2
throughput (see BASELINE.md: the reference publishes no numbers and no Rust
toolchain exists here; REF_GATES_PER_SEC is a documented estimate of
rayon-parallel AES-NI+AVX2 proving on this host class).
"""

import json
import os
import sys
import time

import numpy as np

# Estimated reference (trailofbits/reverie, AVX2+AES-NI, rayon) throughput on
# this host: ~5M AND gates/s for the 256-rep proof.  Derived from the
# per-gate work: 512 B AES keystream + 512 B blake3 absorb + ~100 u64 bit ops
# per gate across 32 packed groups, on a ~16-core host.  To be replaced by a
# measured number when a Rust toolchain is available.
REF_GATES_PER_SEC = 5_000_000

N_GATES = int(os.environ.get("BENCH_GATES", 1_000_000))


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    # persistent compile cache: repeated bench runs skip the (expensive)
    # remote TPU compilation
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.circuit.builders import mul_bench_circuit

    log(f"building circuit: {N_GATES} AND gates")
    t0 = time.time()
    prog, wit2, witz = mul_bench_circuit(N_GATES)
    log(f"  built in {time.time()-t0:.1f}s")

    t0 = time.time()
    sys_ = TpuKKW(prog)
    log(f"  compiled circuit in {time.time()-t0:.1f}s "
        f"(depth={sys_.cc.depth}, m2={sys_.cc.m2})")

    rng = np.random.RandomState(0)
    seeds = rng.randint(0, 256, size=(256, 16), dtype=np.uint8)

    # warmup (includes jit compile)
    t0 = time.time()
    proof = sys_.prove(wit2, witz, seeds=seeds)
    log(f"  warmup prove (incl. jit) {time.time()-t0:.1f}s")

    # steady state: best of 3 (the axon device tunnel's D2H bandwidth varies
    # 20-34 MB/s run to run; the proof pull is ~10 MB of the wall time)
    dt = float("inf")
    for i in range(3):
        t0 = time.time()
        proof = sys_.prove(wit2, witz, seeds=seeds)
        it = time.time() - t0
        log(f"  prove #{i}: {it:.2f}s")
        dt = min(dt, it)
    gates_per_sec = N_GATES / dt
    log(f"  prove best: {dt:.2f}s -> {gates_per_sec/1e6:.2f}M AND gates/s")

    t0 = time.time()
    ok = sys_.verify(proof)
    log(f"  warmup verify (incl. jit): {time.time()-t0:.2f}s ok={ok}")
    t0 = time.time()
    ok = sys_.verify(proof) and ok
    dt_verify = time.time() - t0
    log(f"  verify: {dt_verify:.2f}s ok={ok}")
    if not ok:
        # Correctness is separately evidenced by the golden differential
        # tests (tools/tpu_check.py); log loudly but still report throughput.
        log("  WARNING: verification failed on this run -- investigate!")

    print(
        json.dumps(
            {
                "metric": "AND_gates_per_sec_proving_z2_256reps",
                "value": round(gates_per_sec),
                "unit": "gates/s",
                "vs_baseline": round(gates_per_sec / REF_GATES_PER_SEC, 3),
                "verify_ok": bool(ok),
                "verify_s": round(dt_verify, 3),
            }
        )
    )
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
