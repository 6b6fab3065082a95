"""Round 5: run bench.py's authoritative _device_limited_bench standalone
(1M-gate circuit) so kernel changes can be measured without the full bench
warmup battery."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from reverie_tpu.circuit.builders import mul_bench_circuit
from reverie_tpu.backend.tpu_host import TpuKKW

K = int(os.environ.get("R5_GATES", "1000000"))
print("devices:", jax.devices(), flush=True)
prog, wit2, witz = mul_bench_circuit(K)
sys_ = TpuKKW(prog)
rng = np.random.RandomState(3)
seeds = rng.randint(0, 256, size=(256, 16), dtype=np.uint8)
t0 = time.time()
proof = sys_.prove(wit2, witz, seeds=seeds)
print(f"warmup prove {time.time()-t0:.1f}s, proof {len(proof.to_bytes())} B",
      flush=True)
t0 = time.time()
proof = sys_.prove(wit2, witz, seeds=seeds)
print(f"steady prove {time.time()-t0:.2f}s", flush=True)
d = bench._device_limited_bench(sys_, wit2)
print(d)
tot = sum(d["device_phase_ms"].values())
print(f"total {tot:.1f} ms -> {K/tot/1e3:.1f} M gates/s device-limited")
