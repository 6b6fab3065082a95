import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from reverie_tpu.crypto.kernels import aes_jax as aj
from reverie_tpu.crypto.kernels.aes_pallas import aes_ctr_tape_gf2_pallas

print('backend:', jax.default_backend(), flush=True)
R = 256
rng = np.random.RandomState(5)
pk = rng.randint(0, 256, size=(R, 8, 16), dtype=np.uint8)
B = 1280
rkp = jnp.asarray(aj.round_key_planes(pk.reshape(-1, 16)))
ctrp = aj.counter_planes(B)
mask = jnp.asarray(np.full(R*8//32, 0xFFFFFFFF, np.uint32))

fx = jax.jit(aj.aes_ctr_tape_gf2)
fp = jax.jit(lambda a,c,b=None: aes_ctr_tape_gf2_pallas(a, B, c), static_argnums=())
fp2 = jax.jit(lambda a,c: aes_ctr_tape_gf2_pallas(a, B2, c))
t0=time.time(); ref = np.asarray(fx(rkp, jnp.asarray(ctrp), mask)); print(f'xla warm {time.time()-t0:.1f}s', flush=True)
t0=time.time(); got = np.asarray(fp(rkp, mask)); print(f'pallas warm {time.time()-t0:.1f}s', flush=True)
print('match:', np.array_equal(got, ref), flush=True)

# timing at bench scale
B2 = 15616
ctr2x = jnp.asarray(aj.counter_planes(B2))
ctr2p = jnp.asarray(aj.counter_planes(B2).astype(np.int32))
o = fx(rkp, ctr2x, mask); jax.block_until_ready(o)
t0=time.time(); o = fx(rkp, ctr2x, mask); jax.block_until_ready(o); print(f'xla steady {time.time()-t0:.3f}s', flush=True)
o = fp2(rkp, mask); jax.block_until_ready(o)
t0=time.time(); o = fp2(rkp, mask); jax.block_until_ready(o); print(f'pallas steady {time.time()-t0:.3f}s', flush=True)
