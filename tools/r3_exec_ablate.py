"""Round 3: ablate the levelized MUL-level executor body at the 1M-gate
bench shape (k=1M gates, R=256 reps) to find the execute-phase bottleneck.

Variants:
  u8_barrier   -- replica of the production body (tpu.py _gf2_kind G_MUL):
                  u8 lanes, optimization_barrier before every DUS write
  u8_nobar     -- same, barrier removed (lets XLA fuse producers into DUS)
  u32_barrier  -- 4 reps packed per u32 lane ((k, 64) u32), barrier kept
  u32_nobar    -- u32 lanes, no barrier

The bench circuit (builders.mul_bench_circuit) compiles to one level of k MUL
gates with constant a/b columns and arithmetic-run dst/tape/onl/pre columns,
so the body is: broadcasts + strided tape slices + elementwise u8 ops + DUS.
HBM roofline: ~2 GB of stream traffic @ 819 GB/s ~= 2.5 ms.
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

U8, U32 = jnp.uint8, jnp.uint32
K = 1_000_000
R = 256
L = R // 4  # u32 lanes
V = K + 3


def p8_u8(x):
    t = x ^ (x >> 4)
    t = t ^ (t >> 2)
    t = t ^ (t >> 1)
    return t & jnp.uint8(1)


def exp_u8(c):
    return jnp.zeros_like(c) - c


M1 = jnp.uint32(0x01010101)


def p8_u32(x):
    t = x ^ (x >> 4)
    t = t ^ (t >> 2)
    t = t ^ (t >> 1)
    return t & M1


def exp_u32(c):
    # bytes are 0/1: *255 expands per-byte with no carries
    return c * jnp.uint32(255)


def body_u8(tape2, mask2, corr2, onl2, pre2, salt, barrier):
    # salt varies per call so the axon relay cannot replay a cached execution
    bar = jax.lax.optimization_barrier if barrier else (lambda x: x)
    tape2 = tape2 ^ salt.astype(U8)
    a = jnp.broadcast_to(mask2[1:2], (K, R))
    b = jnp.broadcast_to(mask2[2:3], (K, R))
    ac = jnp.broadcast_to(corr2[1:2], (K, R))
    bc = jnp.broadcast_to(corr2[2:3], (K, R))
    m_ab = jax.lax.slice_in_dim(tape2, 2, 2 + 2 * K - 1, stride=2, axis=0)
    m_new = jax.lax.slice_in_dim(tape2, 3, 3 + 2 * K - 1, stride=2, axis=0)
    delta = (p8_u8(a) & p8_u8(b)) ^ p8_u8(m_ab)
    pre2 = jax.lax.dynamic_update_slice_in_dim(pre2, bar(exp_u8(delta)), 0, axis=0)
    s = (b & exp_u8(ac)) ^ (a & exp_u8(bc)) ^ m_ab ^ m_new
    onl2 = jax.lax.dynamic_update_slice_in_dim(onl2, bar(s), 0, axis=0)
    recon = p8_u8(s) ^ delta
    mask2 = jax.lax.dynamic_update_slice_in_dim(mask2, bar(m_new), 3, axis=0)
    corr2 = jax.lax.dynamic_update_slice_in_dim(
        corr2, bar(recon ^ (ac & bc)), 3, axis=0
    )
    return mask2, corr2, onl2, pre2


def body_u32(tape2, mask2, corr2, onl2, pre2, salt, barrier):
    bar = jax.lax.optimization_barrier if barrier else (lambda x: x)
    tape2 = tape2 ^ salt
    a = jnp.broadcast_to(mask2[1:2], (K, L))
    b = jnp.broadcast_to(mask2[2:3], (K, L))
    ac = jnp.broadcast_to(corr2[1:2], (K, L))
    bc = jnp.broadcast_to(corr2[2:3], (K, L))
    m_ab = jax.lax.slice_in_dim(tape2, 2, 2 + 2 * K - 1, stride=2, axis=0)
    m_new = jax.lax.slice_in_dim(tape2, 3, 3 + 2 * K - 1, stride=2, axis=0)
    delta = (p8_u32(a) & p8_u32(b)) ^ p8_u32(m_ab)
    pre2 = jax.lax.dynamic_update_slice_in_dim(pre2, bar(exp_u32(delta)), 0, axis=0)
    s = (b & exp_u32(ac)) ^ (a & exp_u32(bc)) ^ m_ab ^ m_new
    onl2 = jax.lax.dynamic_update_slice_in_dim(onl2, bar(s), 0, axis=0)
    recon = p8_u32(s) ^ delta
    mask2 = jax.lax.dynamic_update_slice_in_dim(mask2, bar(m_new), 3, axis=0)
    corr2 = jax.lax.dynamic_update_slice_in_dim(
        corr2, bar(recon ^ (ac & bc)), 3, axis=0
    )
    return mask2, corr2, onl2, pre2


def run(name, body, lanes, dtype, barrier):
    mk = jax.jit(
        lambda salt, n, l: (
            (jnp.arange(n, dtype=jnp.uint32)[:, None] * jnp.uint32(131)
             + jnp.arange(l, dtype=jnp.uint32)[None, :] * jnp.uint32(7)
             + jnp.uint32(salt))
        ).astype(dtype),
        static_argnums=(1, 2),
    )
    tape2 = jax.block_until_ready(mk(11, 2 * K + 2, lanes))
    mask2 = jax.block_until_ready(mk(5, V, lanes))
    corr2 = jax.block_until_ready(mk(7, V, lanes) & (M1 if dtype == U32 else jnp.uint8(1)))
    onl2 = jnp.zeros((2 * K, lanes), dtype)
    pre2 = jnp.zeros((K, lanes), dtype)
    fn = jax.jit(lambda t, m, c, o, p, s: body(t, m, c, o, p, s, barrier))
    out = fn(tape2, mask2, corr2, onl2, pre2, jnp.uint32(0))
    np.asarray(out[0][:1, :1])  # force full completion (block_until_ready on
    # the axon relay returns before device completion; only a host pull of a
    # dependent value reliably fences)
    # pull-latency baseline: host round-trip for an already-computed buffer
    tiny = fn(tape2, mask2, corr2, onl2, pre2, jnp.uint32(0))
    np.asarray(tiny[0][:1, :1])
    t0 = time.time()
    np.asarray(tiny[0][:1, :1])
    pull = time.time() - t0
    # N chained calls: each consumes the previous mask2/corr2 (device-side
    # data dependency -> serialized execution), varied salt
    N = 10
    m, c = mask2, corr2
    t0 = time.time()
    for i in range(N):
        m, c, o, p = fn(tape2, m, c, onl2, pre2, jnp.uint32(i + 1))
    np.asarray(m[:1, :1])
    best = max((time.time() - t0 - pull), 1e-9) / N
    gb = (2 * K * lanes * (4 if dtype == U32 else 1) * 2  # tape read + onl write
          + K * lanes * (4 if dtype == U32 else 1) * 3) / 1e9  # pre + mask + corr writes
    print(f"{name:14s} {best*1e3:8.2f} ms   {K/best/1e6:7.1f} M gates/s   "
          f"~{gb/best:5.0f} GB/s stream traffic")
    return out


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    run("u8_barrier", body_u8, R, U8, True)
    run("u8_nobar", body_u8, R, U8, False)
    run("u32_barrier", body_u32, L, U32, True)
    run("u32_nobar", body_u32, L, U32, False)


# ---- piece-wise ablation (u8) ------------------------------------------
def piece(name, fnbody, n_traffic_bytes):
    mk = jax.jit(
        lambda salt, n, l: (
            (jnp.arange(n, dtype=jnp.uint32)[:, None] * jnp.uint32(131)
             + jnp.arange(l, dtype=jnp.uint32)[None, :] * jnp.uint32(7)
             + jnp.uint32(salt))
        ).astype(U8),
        static_argnums=(1, 2),
    )
    tape2 = jax.block_until_ready(mk(11, 2 * K + 2, R))
    dst = jnp.zeros((K, R), U8)
    fn = jax.jit(fnbody)
    out = fn(tape2, dst, jnp.uint32(0))
    np.asarray(out[:1, :1])
    t0 = time.time(); np.asarray(out[:1, :1]); pull = time.time() - t0
    N = 10
    d = dst
    t0 = time.time()
    for i in range(N):
        d = fn(tape2, d, jnp.uint32(i + 1))
    np.asarray(d[:1, :1])
    dt = max(time.time() - t0 - pull, 1e-9) / N
    print(f"{name:24s} {dt*1e3:8.2f} ms   ~{n_traffic_bytes/1e9/dt:5.0f} GB/s")


def strided_read(t, d, s):
    m_ab = jax.lax.slice_in_dim(t, 2, 2 + 2 * K - 1, stride=2, axis=0)
    m_new = jax.lax.slice_in_dim(t, 3, 3 + 2 * K - 1, stride=2, axis=0)
    return (m_ab ^ m_new) ^ s.astype(U8) ^ d * jnp.uint8(0)


def pair_read(t, d, s):
    x = jax.lax.slice_in_dim(t, 2, 2 + 2 * K, axis=0).reshape(K, 2 * R)
    m_ab = x[:, :R]
    m_new = x[:, R:]
    return (m_ab ^ m_new) ^ s.astype(U8) ^ d * jnp.uint8(0)


def contig_read(t, d, s):
    m_ab = jax.lax.slice_in_dim(t, 0, K, axis=0)
    m_new = jax.lax.slice_in_dim(t, K, 2 * K, axis=0)
    return (m_ab ^ m_new) ^ s.astype(U8) ^ d * jnp.uint8(0)


def p8_cost(t, d, s):
    m_ab = jax.lax.slice_in_dim(t, 0, K, axis=0)
    return p8_u8(m_ab ^ s.astype(U8)) ^ d * jnp.uint8(0)


def full_pair_body(t, d, s):
    x = jax.lax.slice_in_dim(t, 2, 2 + 2 * K, axis=0).reshape(K, 2 * R)
    m_ab = x[:, :R] ^ s.astype(U8)
    m_new = x[:, R:]
    a = jnp.broadcast_to(t[0:1], (K, R))
    b = jnp.broadcast_to(t[1:2], (K, R))
    ac = a & jnp.uint8(1)
    bc = b & jnp.uint8(1)
    delta = (p8_u8(a) & p8_u8(b)) ^ p8_u8(m_ab)
    s_ = (b & exp_u8(ac)) ^ (a & exp_u8(bc)) ^ m_ab ^ m_new
    recon = p8_u8(s_) ^ delta
    return recon ^ (ac & bc) ^ d * jnp.uint8(0)


if __name__ == "__main__":
    print("---- pieces ----")
    piece("strided2_read+xor", strided_read, 3 * K * R)
    piece("pair_reshape_read+xor", pair_read, 3 * K * R)
    piece("contig_read+xor", contig_read, 3 * K * R)
    piece("p8(1 input)", p8_cost, 2 * K * R)
    piece("full_body_pair(1 DUS)", full_pair_body, 3 * K * R)


# ---- round-4: split-plane tape reads (even/odd slot planes) -------------
def full_split_body(t, d, s):
    """G_MUL body with the tape pre-split into even/odd slot planes: the
    ab run (even slots) and new run (odd slots) are CONTIGUOUS windows --
    no reshape/lane-split relayout."""
    m_ab = jax.lax.slice_in_dim(t, 1, 1 + K, axis=0) ^ s.astype(U8)
    m_new = jax.lax.slice_in_dim(t, K + 2, 2 * K + 2, axis=0)
    a = jnp.broadcast_to(t[0:1], (K, R))
    b = jnp.broadcast_to(t[1:2], (K, R))
    ac = a & jnp.uint8(1)
    bc = b & jnp.uint8(1)
    delta = (p8_u8(a) & p8_u8(b)) ^ p8_u8(m_ab)
    s_ = (b & exp_u8(ac)) ^ (a & exp_u8(bc)) ^ m_ab ^ m_new
    recon = p8_u8(s_) ^ delta
    return recon ^ (ac & bc) ^ d * jnp.uint8(0)


def full_split_2dus(t, d, s):
    """Same + both stream writes (pre2 via delta-expand, onl2 via s) packed
    into the returned buffer halves -- models the real write traffic."""
    m_ab = jax.lax.slice_in_dim(t, 1, 1 + K, axis=0) ^ s.astype(U8)
    m_new = jax.lax.slice_in_dim(t, K + 2, 2 * K + 2, axis=0)
    a = jnp.broadcast_to(t[0:1], (K, R))
    b = jnp.broadcast_to(t[1:2], (K, R))
    ac = a & jnp.uint8(1)
    bc = b & jnp.uint8(1)
    delta = (p8_u8(a) & p8_u8(b)) ^ p8_u8(m_ab)
    s_ = (b & exp_u8(ac)) ^ (a & exp_u8(bc)) ^ m_ab ^ m_new
    out = jnp.concatenate([exp_u8(delta), s_], axis=0)  # pre2 | onl2
    return out[:K] ^ out[K:] ^ d * jnp.uint8(0)


if __name__ == "__main__" and "split" in sys.argv[1:]:
    print("---- round-4 split-plane ----")
    piece("full_body_split(1 DUS)", full_split_body, 3 * K * R)
    piece("full_body_split+2w", full_split_2dus, 5 * K * R)
