import numpy as np, jax
jax.config.update('jax_platforms','cpu')
import jax.numpy as jnp
from reverie_tpu.crypto.kernels import aes_jax as aj
from reverie_tpu.backend.tpu_host import build_tapes
from reverie_tpu.algebra import u64pair as up

R = 8
rng = np.random.RandomState(6)
pk = rng.randint(0, 256, size=(R, 8, 16), dtype=np.uint8)
mz = 200
_, lo_ref, hi_ref = build_tapes(pk, None, 0, mz)
nbytes = ((mz + 127)//128)*1024
B = nbytes // 16
rkp = aj.round_key_planes(pk.reshape(-1, 16))
ctrp = aj.counter_planes(B)
mask = np.full(R*8//32, 0xFFFFFFFF, np.uint32)
f = jax.jit(aj.aes_ctr_tape_z64)
lo, hi = f(jnp.asarray(rkp), jnp.asarray(ctrp), jnp.asarray(mask))
lo, hi = np.asarray(lo)[:mz], np.asarray(hi)[:mz]
assert np.array_equal(lo, lo_ref) and np.array_equal(hi, hi_ref), 'MISMATCH'
print('z64 device tape matches host')

omit = rng.randint(0, 9, size=R)
_, lo_ref2, hi_ref2 = build_tapes(pk, omit, 0, mz)
mask2 = aj.lane_mask_raw(omit, R)
lo2, hi2 = f(jnp.asarray(rkp), jnp.asarray(ctrp), jnp.asarray(mask2))
assert np.array_equal(np.asarray(lo2)[:mz], lo_ref2) and np.array_equal(np.asarray(hi2)[:mz], hi_ref2)
print('z64 omit masking matches')
