"""Profile prove_batch at N=8 and N=16 (SHA-256) to localize the N=16
per-proof throughput regression (round-2 known gap: 10.7 proofs/s at N=8
vs 3.9 at N=16).  One TPU process; run in background."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["REVERIE_PROFILE"] = "1"

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, flush=True)


def main():
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
        log(f"N={N} warm {time.time()-t0:.2f}s")
        for it in range(2):
            t0 = time.time()
            sys_.prove_batch(wits, seeds=seeds)
            dt = time.time() - t0
            log(f"N={N} steady#{it} {dt:.2f}s -> {N/dt:.2f} proofs/s")


if __name__ == "__main__":
    main()
