"""Generate CPU-golden proofs for tools/tpu_check.py (run with JAX_PLATFORMS=cpu
or PYTHONPATH trick so the axon platform is not claimed)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pickle
import numpy as np
from reverie_tpu.circuit.builders import (
    mul_bench_circuit, wide_and_circuit, mixed_b2a_circuit, z64_mul_bench_circuit)
from reverie_tpu.proof import prove

rng = np.random.RandomState(42)
seeds = rng.randint(0, 256, size=(32, 8, 16), dtype=np.uint8)
g = {}
for name, t in [
    ('mul20', mul_bench_circuit(20)),
    ('wide_and', wide_and_circuit(50, width=32, seed=7)),
    ('b2a', mixed_b2a_circuit()),
    ('deep_scan', wide_and_circuit(700, width=8, seed=11)),
    ('aes_dev', mul_bench_circuit(2500)),
    ('z64_dev', z64_mul_bench_circuit(300)),
]:
    prog, wit2, witz = t
    g[name] = prove(prog, wit2, witz, seeds=seeds).to_bytes()
pickle.dump(g, open('/tmp/golden_proofs.pkl', 'wb'))
print('golden saved:', list(g))
