import time, numpy as np, jax
jax.config.update('jax_platforms','cpu')
from reverie_tpu.circuit.builders import z64_mul_bench_circuit
from reverie_tpu.backend.tpu_host import TpuKKW

prog, wit2, witz = z64_mul_bench_circuit(300)
rng = np.random.RandomState(42)
seeds = rng.randint(0,256,size=(256,16),dtype=np.uint8)
s_ = TpuKKW(prog)
print('cc mz', s_.cc.mz, 'depth', s_.cc.depth, flush=True)
t0=time.time()
pk = np.zeros((256,8,16), np.uint8)
lo, hi = s_._z64_tape(pk, None)
import jax.numpy as jnp
np.asarray(lo)
print(f'z64 tape gen {time.time()-t0:.1f}s', flush=True)
t0=time.time()
proof = s_.prove(wit2, witz, seeds=seeds)
print(f'prove {time.time()-t0:.1f}s', flush=True)
t0=time.time()
print('verify', s_.verify(proof), f'{time.time()-t0:.1f}s', flush=True)
