import numpy as np, jax
jax.config.update('jax_platforms','cpu')
import jax.numpy as jnp
from reverie_tpu.crypto.kernels import aes_jax as aj
from reverie_tpu.crypto.kernels.aes_pallas import aes_ctr_tape_gf2_pallas

R = 32
rng = np.random.RandomState(5)
pk = rng.randint(0, 256, size=(R, 8, 16), dtype=np.uint8)
B = 16
rkp = aj.round_key_planes(pk.reshape(-1, 16))
ctrp = aj.counter_planes(B)
mask = np.full(R*8//32, 0xFFFFFFFF, np.uint32)

ref = np.asarray(jax.jit(aj.aes_ctr_tape_gf2)(jnp.asarray(rkp), jnp.asarray(ctrp), jnp.asarray(mask)))
got = np.asarray(aes_ctr_tape_gf2_pallas(jnp.asarray(rkp), jnp.asarray(ctrp.astype(np.int32)), jnp.asarray(mask), tile_b=8, interpret=True))
print('pallas(interpret) == xla:', np.array_equal(got, ref))
