"""Round-4: extract-phase variant probe (slope method, RTT-cancelled).

The gf2 extractor reads the (n, R) onl2/pre2 u8 streams (512 MB at 1M
gates), selects the K=40 opened rep columns, shifts out the recon bit, and
bit-packs to (K, n//8+1).  SOL is ~0.7 ms (one read pass of both streams);
measured 5.7-5.9 ms for both the pack-all-then-gather and the
gather-then-pack orders.  This probe times the candidate select/pack
strategies in isolation to find where the 8x goes:

  floor    checksum-read both streams (the irreducible pass)
  gather   jnp.take over the lane axis then pack (current)
  packall  pack all 256 columns then gather packed (round-3 form)
  mm_bf16  one-hot bf16 MXU matmul select then pack
  mm_i8    one-hot int8 MXU matmul select then pack (mod-256 exact)
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

U8 = jnp.uint8
N = 1_000_002  # onl2 rows at 1M gates (recon + 2 input rows)
R = 256
K = 40


def slope(step, s0, k_lo=2, k_hi=8, reps=3):
    s = step(s0)
    jax.block_until_ready(s)

    def run(k):
        t0 = time.time()
        x = s0
        for _ in range(k):
            x = step(x)
        jax.block_until_ready(x)
        return time.time() - t0

    return min((run(k_hi) - run(k_lo)) / (k_hi - k_lo) for _ in range(reps))


def pack_rows(bits):
    n, k = bits.shape
    nc = n // 8 + 1
    pad = nc * 8 - n
    bits = jnp.concatenate([bits, jnp.zeros((pad, k), U8)], axis=0)
    bits = bits.reshape(nc, 8, k)
    w = jnp.asarray((128 >> np.arange(8)).astype(np.uint8))
    return jnp.sum(bits * w[None, :, None], axis=1, dtype=U8)


def main():
    rng = np.random.default_rng(0)
    onl = jnp.asarray(rng.integers(0, 256, (N, R), dtype=np.uint8))
    pre = jnp.asarray(rng.integers(0, 256, (N, R), dtype=np.uint8))
    cols = np.sort(rng.choice(R, K, replace=False)).astype(np.int32)
    shifts = rng.integers(0, 8, K).astype(np.uint8)
    cols_d = jnp.asarray(cols)
    sh_d = jnp.asarray(shifts)
    onehot8 = np.zeros((R, K), np.int8)
    onehot8[cols, np.arange(K)] = 1
    oh8 = jnp.asarray(onehot8)
    ohb = jnp.asarray(onehot8.astype(np.float32), dtype=jnp.bfloat16)

    def perturb(a, s):
        return a.at[0, 0].set((a[0, 0] + s).astype(a.dtype))

    def fold(x):
        return jnp.sum(x.astype(jnp.uint32), dtype=jnp.uint32)

    @jax.jit
    def floor_step(s, a, b):
        a = perturb(a, s)
        return fold(a) + fold(b), a, b

    @jax.jit
    def gather_step(s, a, b):
        a = perturb(a, s)
        asel = jnp.take(a, cols_d, axis=1)
        bsel = jnp.take(b, cols_d, axis=1)
        rb = (asel >> sh_d[None, :]) & U8(1)
        cb = bsel & U8(1)
        return fold(pack_rows(rb).T) + fold(pack_rows(cb).T), a, b

    @jax.jit
    def packall_step(s, a, b):
        a = perturb(a, s)
        rb = (a >> jnp.zeros((R,), U8)[None, :]) & U8(1)
        cb = b & U8(1)
        pa = jnp.take(pack_rows(rb).T, cols_d, axis=0)
        pb = jnp.take(pack_rows(cb).T, cols_d, axis=0)
        return fold(pa) + fold(pb), a, b

    @jax.jit
    def mmb_step(s, a, b):
        a = perturb(a, s)
        asel = jnp.dot(a.astype(jnp.bfloat16), ohb,
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        bsel = jnp.dot(b.astype(jnp.bfloat16), ohb,
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        rb = ((asel >> sh_d[None, :].astype(jnp.int32)) & 1).astype(U8)
        cb = (bsel & 1).astype(U8)
        return fold(pack_rows(rb).T) + fold(pack_rows(cb).T), a, b

    @jax.jit
    def mmi_step(s, a, b):
        a = perturb(a, s)
        asel = jax.lax.dot(a.astype(jnp.int8), oh8,
                           preferred_element_type=jnp.int32)
        bsel = jax.lax.dot(b.astype(jnp.int8), oh8,
                           preferred_element_type=jnp.int32)
        rb = (((asel & 0xFF) >> sh_d[None, :].astype(jnp.int32)) & 1).astype(U8)
        cb = (bsel & 1).astype(U8)
        return fold(pack_rows(rb).T) + fold(pack_rows(cb).T), a, b

    for name, stp in (("floor", floor_step), ("gather", gather_step),
                      ("packall", packall_step), ("mm_bf16", mmb_step),
                      ("mm_i8", mmi_step)):
        def step(st, stp=stp):
            s, a, b = st
            out, a, b = stp(s, a, b)
            return out.astype(jnp.uint32), a, b
        d = slope(step, (jnp.uint32(1), onl, pre))
        print(f"{name:8s} {d*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# Pallas pack+shift kernel prototype
# ---------------------------------------------------------------------------

def _pack_kernel(tc: int, n_rows: int, x_ref, sh_ref, o_ref):
    """Block: x (TC*8, R) u8 bits source, sh (1, R) u8; out (TC, R) u8.
    out[c, r] = sum_j (((x[8c+j, r] >> sh[r]) & 1) << (7-j)), rows >= n_rows
    read as zero."""
    import jax
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.uint32)
    sh = sh_ref[...].astype(jnp.uint32)  # (1, R)
    tn = tc * 8
    base = i * tn
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + base
    bits = jax.lax.select(rows < n_rows,
                          (x >> sh) & jnp.uint32(1),
                          jnp.zeros_like(x))
    b3 = bits.reshape(tc, 8, x.shape[1])
    acc = jnp.zeros((tc, x.shape[1]), jnp.uint32)
    for j in range(8):
        acc = acc | (b3[:, j, :] << (7 - j))
    o_ref[...] = acc.astype(jnp.uint8)


def pack_shift_pallas(x, sh, tc: int = 128, interpret: bool = False):
    """x (n, R) u8, sh (R,) u8 -> (n//8+1, R) packed MSB-first (always-
    remainder-byte convention), rows masked to n."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, r = x.shape
    nc = n // 8 + 1
    g = (nc + tc - 1) // tc
    out = pl.pallas_call(
        functools.partial(_pack_kernel, tc, n),
        out_shape=jax.ShapeDtypeStruct((g * tc, r), jnp.uint8),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((tc * 8, r), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tc, r), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, sh.reshape(1, r))
    return out[:nc]


def main_pallas():
    rng = np.random.default_rng(0)
    onl = jnp.asarray(rng.integers(0, 256, (N, R), dtype=np.uint8))
    pre = jnp.asarray(rng.integers(0, 256, (N, R), dtype=np.uint8))
    cols = np.sort(rng.choice(R, K, replace=False)).astype(np.int32)
    shifts_full = rng.integers(0, 8, R).astype(np.uint8)
    sh_d = jnp.asarray(shifts_full)
    zer = jnp.zeros((R,), jnp.uint8)
    onehot8 = np.zeros((R, K), np.int8)
    onehot8[cols, np.arange(K)] = 1
    oh8 = jnp.asarray(onehot8)

    def perturb(a, s):
        return a.at[0, 0].set((a[0, 0] + s).astype(a.dtype))

    def fold(x):
        return jnp.sum(x.astype(jnp.uint32), dtype=jnp.uint32)

    @jax.jit
    def pk_step(s, a, b):
        a = perturb(a, s)
        pa = pack_shift_pallas(a, sh_d)
        pb = pack_shift_pallas(b, zer)
        sa = jax.lax.dot(pa.astype(jnp.int8), oh8,
                         preferred_element_type=jnp.int32).astype(jnp.uint8)
        sb = jax.lax.dot(pb.astype(jnp.int8), oh8,
                         preferred_element_type=jnp.int32).astype(jnp.uint8)
        return fold(sa.T) + fold(sb.T), a, b

    # correctness vs the XLA reference form
    small = jnp.asarray(rng.integers(0, 256, (1001, R), dtype=np.uint8))
    want = pack_rows((np.asarray(small) >> shifts_full[None, :]) & 1)
    got = pack_shift_pallas(small, sh_d, tc=8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    print("pallas pack: byte-exact vs XLA reference", flush=True)

    def step(st):
        s, a, b = st
        out, a, b = pk_step(s, a, b)
        return out.astype(jnp.uint32), a, b

    d = slope(step, (jnp.uint32(1), onl, pre))
    print(f"pallas_pack+mm_i8 {d*1e3:7.2f} ms", flush=True)


if __name__ == "__main__" and "pallas" in sys.argv[1:]:
    main_pallas()


def main_fused():
    """Pack+select as ONE bf16 MXU matmul: bits (nc0, 8R) @ W (8R, K),
    W[(j, r), k] = onehot[r, k] * (128 >> j).  The reshape (nc0, 8, R) ->
    (nc0, 8R) is free (row-major); the u8->bf16 convert should fuse into the
    matmul lhs load."""
    rng = np.random.default_rng(0)
    onl = jnp.asarray(rng.integers(0, 256, (N, R), dtype=np.uint8))
    pre = jnp.asarray(rng.integers(0, 256, (N, R), dtype=np.uint8))
    cols = np.sort(rng.choice(R, K, replace=False)).astype(np.int32)
    shifts_full = rng.integers(0, 8, R).astype(np.uint8)
    sh_d = jnp.asarray(shifts_full)
    zer = jnp.zeros((R,), jnp.uint8)
    onehot = np.zeros((R, K), np.float32)
    onehot[cols, np.arange(K)] = 1.0
    w8 = (128 >> np.arange(8)).astype(np.float32)  # (8,)
    W = (w8[:, None, None] * onehot[None, :, :]).reshape(8 * R, K)
    W_d = jnp.asarray(W, dtype=jnp.bfloat16)

    def fused(x, sh):
        n = x.shape[0]
        nc0 = n // 8
        bits = ((x >> sh[None, :]) & U8(1))
        main = bits[: nc0 * 8].reshape(nc0, 8 * R).astype(jnp.bfloat16)
        out = jnp.dot(main, W_d, preferred_element_type=jnp.float32)
        # tail chunk: n - 8*nc0 rows + zero pad -> one byte row
        tail_bits = bits[nc0 * 8:]  # (t, R)
        t = tail_bits.shape[0]
        tw = jnp.asarray(w8[:t, None], dtype=jnp.bfloat16)
        tail = jnp.dot(
            (tail_bits.astype(jnp.bfloat16) * tw).sum(0, keepdims=True),
            jnp.asarray(onehot, jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return jnp.concatenate([out, tail], axis=0).astype(jnp.uint8)  # (nc, K)

    def perturb(a, s):
        return a.at[0, 0].set((a[0, 0] + s).astype(a.dtype))

    def fold(x):
        return jnp.sum(x.astype(jnp.uint32), dtype=jnp.uint32)

    @jax.jit
    def f_step(s, a, b):
        a = perturb(a, s)
        return fold(fused(a, sh_d).T) + fold(fused(b, zer).T), a, b

    # correctness
    small = np.asarray(jnp.asarray(rng.integers(0, 256, (1001, R), dtype=np.uint8)))
    want = np.asarray(pack_rows((small >> shifts_full[None, :]) & 1))[:, cols]
    got = np.asarray(jax.jit(fused)(jnp.asarray(small), sh_d))
    np.testing.assert_array_equal(got, want)
    print("fused mm pack: byte-exact vs XLA reference", flush=True)

    def step(st):
        s, a, b = st
        out, a, b = f_step(s, a, b)
        return out.astype(jnp.uint32), a, b

    d = slope(step, (jnp.uint32(1), onl, pre))
    print(f"mm_fused_bf16 {d*1e3:7.2f} ms", flush=True)


if __name__ == "__main__" and "fused" in sys.argv[1:]:
    main_fused()


def _pack_kernel_u8(tc: int, n_rows: int, x_ref, m_ref, o_ref):
    """All-u8 variant: no widening; Mosaic keeps the (4,1)-packed layout.
    m_ref holds (1 << sh) per lane -- Mosaic has no variable i8 shift, so the
    bit test is (x & m) != 0 and the pack is a select of constant weights."""
    import jax
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    x = x_ref[...]
    m = m_ref[...]  # (1, R) u8 = 1 << sh
    tn = tc * 8
    base = i * tn
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + base
    x = jnp.where(rows < n_rows, x, U8(0))
    nz = (x & m) != 0
    b3 = nz.reshape(tc, 8, x.shape[1])
    r = x.shape[1]
    acc = jnp.where(b3[:, 0, :], U8(128), U8(0))
    for j in range(1, 8):
        acc = acc | jnp.where(b3[:, j, :], U8(128 >> j), U8(0))
    o_ref[...] = acc


def _pack_kernel_mxu(tc: int, n_rows: int, x_ref, sh_ref, w_ref, o_ref):
    """Banded-MXU variant: pack contraction as (TC, TN) @ (TN, R) bf16."""
    import jax
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    x = x_ref[...]
    m = sh_ref[...]  # (1, R) u8 = 1 << sh
    tn = tc * 8
    base = i * tn
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + base
    x = jnp.where(rows < n_rows, x, U8(0))
    bits = jnp.where((x & m) != 0, jnp.bfloat16(1), jnp.bfloat16(0))
    out = jnp.dot(w_ref[...], bits, preferred_element_type=jnp.float32)
    o_ref[...] = out.astype(jnp.int32).astype(jnp.uint8)


def pack_shift_pallas2(x, sh, tc: int = 128, variant: str = "u8",
                       interpret: bool = False):
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, r = x.shape
    nc = n // 8 + 1
    g = (nc + tc - 1) // tc
    if variant == "u8":
        out = pl.pallas_call(
            functools.partial(_pack_kernel_u8, tc, n),
            out_shape=jax.ShapeDtypeStruct((g * tc, r), jnp.uint8),
            grid=(g,),
            in_specs=[
                pl.BlockSpec((tc * 8, r), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tc, r), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, (U8(1) << sh).reshape(1, r))
        return out[:nc]
    tn = tc * 8
    wband = np.zeros((tc, tn), np.float32)
    for c in range(tc):
        for j in range(8):
            wband[c, 8 * c + j] = float(128 >> j)
    out = pl.pallas_call(
        functools.partial(_pack_kernel_mxu, tc, n),
        out_shape=jax.ShapeDtypeStruct((g * tc, r), jnp.uint8),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((tn, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, tn), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tc, r), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, (U8(1) << sh).reshape(1, r), jnp.asarray(wband, jnp.bfloat16))
    return out[:nc]


def main_v2():
    rng = np.random.default_rng(0)
    onl = jnp.asarray(rng.integers(0, 256, (N, R), dtype=np.uint8))
    pre = jnp.asarray(rng.integers(0, 256, (N, R), dtype=np.uint8))
    cols = np.sort(rng.choice(R, K, replace=False)).astype(np.int32)
    shifts_full = rng.integers(0, 8, R).astype(np.uint8)
    sh_d = jnp.asarray(shifts_full)
    zer = jnp.zeros((R,), jnp.uint8)
    onehot8 = np.zeros((R, K), np.int8)
    onehot8[cols, np.arange(K)] = 1
    oh8 = jnp.asarray(onehot8)

    def perturb(a, s):
        return a.at[0, 0].set((a[0, 0] + s).astype(a.dtype))

    def fold(x):
        return jnp.sum(x.astype(jnp.uint32), dtype=jnp.uint32)

    # correctness first
    small = np.asarray(rng.integers(0, 256, (1001, R)).astype(np.uint8))
    want = np.asarray(pack_rows((small >> shifts_full[None, :]) & 1))
    ok = []
    for variant in ("u8", "mxu"):
        try:
            got = np.asarray(pack_shift_pallas2(jnp.asarray(small), sh_d,
                                                tc=8, variant=variant))
            np.testing.assert_array_equal(got, want)
            print(f"pallas2 {variant}: byte-exact", flush=True)
            ok.append(variant)
        except Exception as e:
            print(f"pallas2 {variant}: FAIL {str(e)[:160]}", flush=True)

    for variant in ok:
        for tc in (64, 128, 256):
            @jax.jit
            def pk_step(s, a, b, tc=tc, variant=variant):
                a = perturb(a, s)
                pa = pack_shift_pallas2(a, sh_d, tc=tc, variant=variant)
                pb = pack_shift_pallas2(b, zer, tc=tc, variant=variant)
                sa = jax.lax.dot(pa.astype(jnp.int8), oh8,
                                 preferred_element_type=jnp.int32)
                sb = jax.lax.dot(pb.astype(jnp.int8), oh8,
                                 preferred_element_type=jnp.int32)
                return (fold(sa.astype(jnp.uint8).T)
                        + fold(sb.astype(jnp.uint8).T)), a, b

            def step(st, pk_step=pk_step):
                s, a, b = st
                out, a, b = pk_step(s, a, b)
                return out.astype(jnp.uint32), a, b

            try:
                d = slope(step, (jnp.uint32(1), onl, pre))
                print(f"pallas2_{variant} tc={tc}: {d*1e3:7.2f} ms", flush=True)
            except Exception as e:
                print(f"pallas2_{variant} tc={tc}: FAIL {str(e)[:120]}", flush=True)


if __name__ == "__main__" and "v2" in sys.argv[1:]:
    main_v2()
