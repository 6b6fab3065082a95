"""Hardware validation: prove+verify on the real TPU, proof bytes vs CPU-golden
pickles (regenerate with tools/make_goldens.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time, numpy as np
import jax, os
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print('backend:', jax.default_backend(), flush=True)
from reverie_tpu.circuit.builders import mul_bench_circuit, wide_and_circuit, mixed_b2a_circuit, z64_mul_bench_circuit
from reverie_tpu.backend.tpu_host import TpuKKW

rng = np.random.RandomState(42)
seeds = rng.randint(0, 256, size=(256, 16), dtype=np.uint8)
golden = {}
import pickle
if os.path.exists('/tmp/golden_proofs.pkl'):
    golden = pickle.load(open('/tmp/golden_proofs.pkl','rb'))

for name, (prog, wit2, witz) in [
    ('mul20', mul_bench_circuit(20)),
    ('wide_and', wide_and_circuit(50, width=32, seed=7)),
    ('b2a', mixed_b2a_circuit()),
    ('deep_scan', wide_and_circuit(700, width=8, seed=11)),
    ('aes_dev', mul_bench_circuit(2500)),      # m2 > 4096: device AES path
    ('z64_dev', z64_mul_bench_circuit(300)),  # mz > 512: device z64 AES path
]:
    t0 = time.time()
    s_ = TpuKKW(prog)
    proof = s_.prove(wit2, witz, seeds=seeds)
    t1 = time.time()
    ok = s_.verify(proof)
    t2 = time.time()
    gmatch = (golden.get(name) == proof.to_bytes()) if name in golden else 'n/a'
    print(f'{name}: verify={ok} golden_match={gmatch} prove={t1-t0:.1f}s verify={t2-t1:.1f}s', flush=True)
