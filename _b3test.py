import numpy as np, jax
jax.config.update('jax_platforms','cpu')
from reverie_tpu.crypto.kernels.blake3_jax import hash_columns, hash_pair_columns
from reverie_tpu.crypto import blake3_many, blake3

rng = np.random.RandomState(0)
for T in [0, 1, 3, 63, 64, 65, 1000, 1024, 1025, 2048, 3000, 5000, 9999]:
    R = 16
    buf = rng.randint(0, 256, size=(max(T,1), R), dtype=np.uint8)
    got = np.asarray(hash_columns(buf, T))
    want = blake3_many(np.ascontiguousarray(buf[:T].T)) if T else np.stack([np.frombuffer(blake3(b''), np.uint8)]*R)
    assert np.array_equal(got, want), T
print('hash_columns OK', flush=True)
a = rng.randint(0, 256, size=(5, 32), dtype=np.uint8)
b = rng.randint(0, 256, size=(5, 32), dtype=np.uint8)
got = np.asarray(hash_pair_columns(jnp_a:=a, b))
want = np.stack([np.frombuffer(blake3(a[i].tobytes()+b[i].tobytes()), np.uint8) for i in range(5)])
assert np.array_equal(got, want)
print('hash_pair OK', flush=True)
