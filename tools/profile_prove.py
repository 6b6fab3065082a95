import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os, time
os.environ['REVERIE_PROFILE'] = '1'
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from reverie_tpu.backend.tpu_host import TpuKKW
from reverie_tpu.circuit.builders import mul_bench_circuit

prog, wit2, witz = mul_bench_circuit(int(os.environ.get('BENCH_GATES', 1000000)))
s_ = TpuKKW(prog)
seeds = np.random.RandomState(0).randint(0, 256, size=(256, 16), dtype=np.uint8)
t0=time.time(); s_.prove(wit2, witz, seeds=seeds); print(f'warmup {time.time()-t0:.1f}s', flush=True)
t0=time.time(); s_.prove(wit2, witz, seeds=seeds); print(f'steady {time.time()-t0:.1f}s', flush=True)
