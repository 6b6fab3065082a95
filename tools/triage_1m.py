"""Triage the 1M-gate verify failure: pallas vs XLA AES paths."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from reverie_tpu.backend.tpu_host import TpuKKW
from reverie_tpu.circuit.builders import mul_bench_circuit

n = int(os.environ.get('BENCH_GATES', 1000000))
prog, wit2, witz = mul_bench_circuit(n)
seeds = np.random.RandomState(0).randint(0, 256, size=(256, 16), dtype=np.uint8)

s1 = TpuKKW(prog)
p1 = s1.prove(wit2, witz, seeds=seeds)   # pallas prove
print('pallas prove done', flush=True)
os.environ['REVERIE_NO_PALLAS'] = '1'
s2 = TpuKKW(prog)
p2 = s2.prove(wit2, witz, seeds=seeds)   # xla prove
print('xla prove done; proofs equal:', p1.to_bytes() == p2.to_bytes(), flush=True)
print('xla-verify(xla proof):', s2.verify(p2), flush=True)
del os.environ['REVERIE_NO_PALLAS']
print('pallas-verify(pallas proof):', s1.verify(p1), flush=True)
