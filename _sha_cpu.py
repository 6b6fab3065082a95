import time, hashlib, numpy as np, jax
jax.config.update('jax_platforms','cpu')
from reverie_tpu.circuit.sha256 import *
from reverie_tpu.backend.tpu_host import TpuKKW

msg = b'reverie on tpu'
digest = hashlib.sha256(msg).digest()
t0=time.time()
prog, _ = sha256_preimage_statement(digest)
print(f'circuit {time.time()-t0:.1f}s', flush=True)
t0=time.time()
s_ = TpuKKW(prog)
print(f'compile {time.time()-t0:.1f}s depth={s_.cc.depth}', flush=True)
wit = block_to_witness_bits(sha256_pad_one_block(msg))
rng = np.random.RandomState(0)
seeds = rng.randint(0,256,size=(256,16),dtype=np.uint8)
t0=time.time()
proof = s_.prove(wit, [], seeds=seeds)
print(f'prove(warm+jit) {time.time()-t0:.1f}s size={len(proof.to_bytes())}', flush=True)
t0=time.time()
proof = s_.prove(wit, [], seeds=seeds)
print(f'prove(steady) {time.time()-t0:.1f}s', flush=True)
t0=time.time()
ok = s_.verify(proof)
print(f'verify {time.time()-t0:.1f}s ok={ok}', flush=True)
