"""Round-4 hardware battery (run when the axon tunnel is up).

Parts (select by argv, default all):
  blake3   -- hash_columns production path, from-bytes kernel vs XLA indexed
              scan, at the 1M-gate transcript shapes + kernel variants/tiles
              (round-4 bar: >=80 GB/s at T=2M, R=256)
  fbcheck  -- byte-exactness of the from-bytes kernel on HW vs the XLA oracle
              (pltpu.bitcast sublane semantics must match interpret mode)
  aes      -- AES tape kernel timing (varied-start authority) + byte check
  devlim   -- host-pull-fenced per-phase 1M profile -> the chip metric
  z64      -- z64 50k-mul fenced profile (player-major layout, round-4)
  barrier  -- golden byte-exact run with narrowed vs full barriers
              (tools/tpu_check.py covers all modes; this records both)

Methodology: chained data-dependent inputs + host-pull fencing
(tools/r3_exec_ablate.py finding: block_until_ready does not reliably block
on the axon relay).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R = 256


def part_blake3():
    from reverie_tpu.crypto.kernels.blake3_jax import hash_columns

    def run(T, env, label, iters=5):
        for k in ("REVERIE_BLAKE3_FB", "REVERIE_BLAKE3_SCAN"):
            os.environ.pop(k, None)
        os.environ.update(env)
        GB = T * R / 1e9

        @jax.jit
        def gen(salt):
            return (
                jnp.arange(T, dtype=jnp.uint32)[:, None] * jnp.uint32(2654435761)
                + jnp.arange(R, dtype=jnp.uint32)[None, :] + salt
            ).astype(jnp.uint8)

        @jax.jit
        def step(salt):
            h = hash_columns(gen(salt), T)
            return h[0, 0].astype(jnp.uint32)

        s = gen(jnp.uint32(0))[0, 0].astype(jnp.uint32)
        np.asarray(s)
        t0 = time.time(); np.asarray(s); pull = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            s = gen(s)[0, 0].astype(jnp.uint32)
        np.asarray(s)
        tgen = max(time.time() - t0 - pull, 0) / iters
        s = step(jnp.uint32(1))
        np.asarray(s)
        t0 = time.time()
        for _ in range(iters):
            s = step(s)
        np.asarray(s)
        dt = max((time.time() - t0 - pull) / iters - tgen, 1e-9)
        print(f"T={T:9d} {label:14s} {dt*1e3:8.2f} ms  ~{GB/dt:6.1f} GB/s"
              f"  (gen {tgen*1e3:.2f} ms)", flush=True)

    for T in (2_000_000, 1_000_000):
        run(T, {}, "frombytes(def)")
        run(T, {"REVERIE_BLAKE3_FB": "nt"}, "frombytes(nt)")
        run(T, {"REVERIE_BLAKE3_FB": "0"}, "xla_indexed")
    os.environ.pop("REVERIE_BLAKE3_FB", None)

    # tile sweep on the raw kernel
    from reverie_tpu.crypto.kernels.blake3_pallas import chunk_cvs_from_bytes

    T = 2_000_000
    n = T // 1024

    @jax.jit
    def gen(salt):
        return (
            jnp.arange(T, dtype=jnp.uint32)[:, None] * jnp.uint32(2654435761)
            + jnp.arange(R, dtype=jnp.uint32)[None, :] + salt
        ).astype(jnp.uint8)

    for tc in (4, 8, 16):
        for tr in (128, 256):
            for tr_flag in (True, False):
                try:
                    fn = jax.jit(lambda s, tc=tc, tr=tr, f=tr_flag: chunk_cvs_from_bytes(
                        gen(s), n, 0, tile_c=tc, tile_r=tr, transpose=f
                    )[0][0, 0, 0].astype(jnp.uint32))
                    s = fn(jnp.uint32(0)); np.asarray(s)
                    t0 = time.time()
                    for _ in range(5):
                        s = fn(s)
                    np.asarray(s)
                    dt = (time.time() - t0) / 5
                    print(f"kernel tc={tc} tr={tr} transpose={tr_flag}: "
                          f"{dt*1e3:7.2f} ms ~{T*R/1e9/dt:6.1f} GB/s", flush=True)
                except Exception as e:
                    print(f"kernel tc={tc} tr={tr} transpose={tr_flag}: "
                          f"FAIL {str(e)[:120]}", flush=True)


def part_fbcheck():
    from reverie_tpu.crypto.kernels import blake3_jax as bj
    from reverie_tpu.crypto.kernels.blake3_pallas import chunk_cvs_from_bytes

    rng = np.random.default_rng(5)
    for (n, Rr, base) in [(19, 256, 0), (8, 128, 7), (5, 40, 3)]:
        buf = rng.integers(0, 256, size=(n * 1024 + 11, Rr), dtype=np.uint8)
        words = bj._bytes_to_words(jnp.asarray(buf[: n * 1024])).reshape(
            n, 16, 16, Rr)
        w0, w1 = bj._chunk_cvs_indexed(words, base)
        for tr_flag in (True, False):
            f0, f1 = chunk_cvs_from_bytes(jnp.asarray(buf), n, base,
                                          transpose=tr_flag)
            ok = np.array_equal(np.asarray(w0), np.asarray(f0)) and \
                np.array_equal(np.asarray(w1), np.asarray(f1))
            print(f"fbcheck n={n} R={Rr} base={base} transpose={tr_flag}: "
                  f"{'OK' if ok else 'MISMATCH *** '}", flush=True)
            assert ok, "from-bytes kernel diverges on HW -- do NOT default on"


def part_aes():
    # varied-start authority: tools/aes_hw_check.py is the byte oracle;
    # here we time the production tape path at the 1M shape, std vs
    # column-scheduled round body, and byte-check colsched vs std on HW
    # (interpret-mode validation is impossible: XLA:CPU's superlinear
    # compile on the unrolled graph exceeds 30 min)
    from reverie_tpu.crypto.kernels import aes_jax as aj
    from reverie_tpu.crypto.kernels.aes_pallas import aes_ctr_tape_gf2_pallas

    rng = np.random.default_rng(9)
    keys_s = rng.integers(0, 256, (256, 16), dtype=np.uint8)
    mask_s = np.full(256 // 32, 0xFFFFFFFF, np.uint32)
    a = aes_ctr_tape_gf2_pallas(
        aj.round_key_planes_device(jnp.asarray(keys_s)), 64,
        jnp.asarray(mask_s), start_block=5)
    b = aes_ctr_tape_gf2_pallas(
        aj.round_key_planes_device(jnp.asarray(keys_s)), 64,
        jnp.asarray(mask_s), start_block=5, colsched=True)
    ok = np.array_equal(np.asarray(a), np.asarray(b))
    print(f"colsched byte-check vs std: {'OK' if ok else 'MISMATCH ***'}",
          flush=True)
    assert ok

    B = 15626
    keys = rng.integers(0, 256, (2048, 16), dtype=np.uint8)
    mask = np.full(2048 // 32, 0xFFFFFFFF, np.uint32)
    for cs in (False, True):
        fn = jax.jit(lambda k, start, cs=cs: aes_ctr_tape_gf2_pallas(
            aj.round_key_planes_device(k), B, jnp.asarray(mask),
            start_block=start, colsched=cs,
        )[0, 0].astype(jnp.uint32))
        s = fn(jnp.asarray(keys), jnp.int32(0))
        np.asarray(s)
        t0 = time.time()
        it = 5
        for i in range(it):
            s = fn(jnp.asarray(keys), (s % 97).astype(jnp.int32))
        np.asarray(s)
        dt = (time.time() - t0) / it
        print(f"aes tape B={B} Kw=512 colsched={cs}: {dt*1e3:.1f} ms "
              f"~{B*16*2048/1e9/dt:.1f} GB/s keystream", flush=True)


def part_devlim():
    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.circuit.builders import mul_bench_circuit

    import bench

    prog, wit2, witz = mul_bench_circuit(1_000_000)
    sys_ = TpuKKW(prog)
    sys_.prove(wit2, witz)  # warm all compiles
    out = bench._device_limited_bench(sys_, wit2)
    print("devlim:", out, flush=True)


def part_z64():
    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.circuit.builders import z64_mul_bench_circuit

    N = 50_000
    prog, w2, wz = z64_mul_bench_circuit(N)
    sys_ = TpuKKW(prog)
    rng = np.random.default_rng(3)
    seeds = rng.integers(0, 256, (256, 16), dtype=np.uint8)
    p = sys_.prove(w2, wz, seeds=seeds)
    assert sys_.verify(p)
    os.environ["REVERIE_PROFILE"] = "1"
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        sys_.prove(w2, wz, seeds=seeds)
        best = min(best, time.time() - t0)
    os.environ.pop("REVERIE_PROFILE")
    print(f"z64 50k prove best {best:.2f}s = {N/best/1e3:.1f}k gates/s "
          f"(player-major layout)", flush=True)


def part_barrier():
    import subprocess

    for env_extra, label in (({}, "narrow(default)"),
                             ({"REVERIE_FULL_BARRIER": "1"}, "full")):
        env = dict(os.environ, **env_extra)
        t0 = time.time()
        rc = subprocess.call(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "tpu_check.py")], env=env)
        print(f"tpu_check [{label}]: rc={rc} ({time.time()-t0:.0f}s)",
              flush=True)
        assert rc == 0, f"golden check failed with {label} barriers"


PARTS = {
    "blake3": part_blake3, "fbcheck": part_fbcheck, "aes": part_aes,
    "devlim": part_devlim, "z64": part_z64, "barrier": part_barrier,
}

if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    for name in (sys.argv[1:] or ["fbcheck", "blake3", "aes", "devlim",
                                  "z64", "barrier"]):
        print(f"===== {name} =====", flush=True)
        PARTS[name]()
