import time, numpy as np, jax
jax.config.update('jax_platforms','cpu')
import jax.numpy as jnp
from reverie_tpu.crypto.kernels import aes_jax as aj
from reverie_tpu.crypto.kernels.aes_pallas import aes_ctr_tape_gf2_pallas

R = 32
rng = np.random.RandomState(5)
pk = rng.randint(0, 256, size=(R, 8, 16), dtype=np.uint8)
B = 8
rkp = jnp.asarray(aj.round_key_planes(pk.reshape(-1, 16)))
ctrp = jnp.asarray(aj.counter_planes(B).astype(np.int32))
mask = jnp.asarray(np.full(R*8//32, 0xFFFFFFFF, np.uint32))

t0=time.time()
f = jax.jit(lambda a,b,c: aes_ctr_tape_gf2_pallas(a,b,c, tile_b=8, interpret=True))
lowered = f.lower(rkp, ctrp, mask)
print(f'trace/lower {time.time()-t0:.1f}s', flush=True)
t0=time.time()
comp = lowered.compile()
print(f'compile {time.time()-t0:.1f}s', flush=True)
t0=time.time()
out = np.asarray(comp(rkp, ctrp, mask))
print(f'run {time.time()-t0:.1f}s', flush=True)
ref = np.asarray(jax.jit(aj.aes_ctr_tape_gf2)(rkp, jnp.asarray(aj.counter_planes(B)), mask))
print('match:', np.array_equal(out, ref), flush=True)
