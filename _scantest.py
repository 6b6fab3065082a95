import numpy as np, jax
jax.config.update('jax_platforms','cpu')
from reverie_tpu.circuit.builders import wide_and_circuit
from reverie_tpu.backend.tpu_host import TpuKKW
from reverie_tpu.proof import prove as cpu_prove

# deep circuit: wide_and with small width creates dependency chains
prog, wit2, witz = wide_and_circuit(600, width=8, seed=11)
rng = np.random.RandomState(42)
seeds = rng.randint(0, 256, size=(256, 16), dtype=np.uint8)
s_ = TpuKKW(prog)
print('depth:', s_.cc.depth)
assert s_.cc.depth > TpuKKW.SCAN_DEPTH_THRESHOLD, 'not deep enough to exercise scan'
cpu_proof = cpu_prove(prog, wit2, witz, seeds=seeds.reshape(32, 8, 16))
tpu_proof = s_.prove(wit2, witz, seeds=seeds)
print('bytes equal:', tpu_proof.to_bytes() == cpu_proof.to_bytes())
print('verify:', s_.verify(tpu_proof))
