"""Part 7: scan-body variants at the REAL SHA-256 batch shape
(n_waves=5266, W=64, R=4096 = batch N=16, T=45282 tape rows, measured from
the compiled circuit -- tools output 2026-08-19).

Variants:
  base       -- production fast2 replica: 7 gathers (4 arena, 2 tape, 1 wit)
                + 2 DUS
  u16fuse    -- u16 mask|corr arena, ONE (2W,) arena gather split into
                a/b, ONE (2W,) tape gather, 1 DUS: 3 gathers + 1 DUS
  u16fuse_u4 -- same + lax.scan unroll=4
  u16fuse_w32-- same at W=32 (halved waste: real occupancy is 40% at W=64),
                n_waves grows to the measured W=32 packing
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

U8, U16 = jnp.uint8, jnp.uint16
R, T = 4096, 45282
G_MUL, G_INPUT, G_ADD, G_ADDC, G_SUBC, G_MULC, G_RANDOM, G_CONST, G_ASSERT = \
    range(9)


def _parity8(x):
    x = x ^ (x >> 4)
    x = x ^ (x >> 2)
    x = x ^ (x >> 1)
    return x & jnp.uint8(1)


def _expand(b):
    return b * jnp.uint8(0xFF)


def dev_idx(shape, hi, salt):
    a = jnp.arange(shape[0], dtype=jnp.uint32)[:, None]
    b = jnp.arange(shape[1], dtype=jnp.uint32)[None, :]
    mixed = a * jnp.uint32(2654435761) + b * jnp.uint32(40503) + jnp.uint32(salt)
    return (mixed % jnp.uint32(hi)).astype(jnp.int32)


def make_xs(NW, W, V2):
    return jax.jit(lambda: {
        "op": dev_idx((NW, W), 6, 1),
        "a": dev_idx((NW, W), V2, 2),
        "b": dev_idx((NW, W), V2, 3),
        "t0": dev_idx((NW, W), T, 4),
        "t1": dev_idx((NW, W), T, 5),
        "wit": dev_idx((NW, W), 512, 6),
        "cbit": dev_idx((NW, W), 2, 7),
        "slot0": 1 + jnp.arange(NW, dtype=jnp.int32) * W,
    })()


mk8 = jax.jit(lambda salt, n: (
    (jnp.arange(n, dtype=jnp.uint32)[:, None] * 131
     + jnp.arange(R, dtype=jnp.uint32)[None, :] * 7 + salt) & 0xFF
).astype(jnp.uint8), static_argnums=(1,))


def compute(op, a_m, a_c, b_m, b_c, t0, t1, in_w, cbit):
    delta = (_parity8(a_m) & _parity8(b_m)) ^ _parity8(t0)
    s = (b_m & _expand(a_c)) ^ (a_m & _expand(b_c)) ^ t0 ^ t1
    recon = _parity8(s) ^ delta
    mul_corr = recon ^ (a_c & b_c)
    in_c = in_w ^ _parity8(t0)
    mask_new = jnp.select(
        [op == G_MUL, op == G_INPUT, op == G_ADD,
         (op == G_ADDC) | (op == G_SUBC), op == G_MULC, op == G_RANDOM],
        [t1, t0, a_m ^ b_m, a_m, a_m & _expand(cbit), t0],
        jnp.zeros_like(a_m),
    )
    corr_new = jnp.select(
        [op == G_MUL, op == G_INPUT, op == G_ADD,
         (op == G_ADDC) | (op == G_SUBC), op == G_MULC, op == G_CONST],
        [mul_corr, in_c, a_c ^ b_c, a_c ^ cbit, a_c & cbit, cbit],
        jnp.zeros_like(a_c),
    )
    ys = {"pre": _expand(delta),
          "onl": jnp.select([op == G_MUL, op == G_ASSERT, op == G_INPUT],
                            [s, a_m, _expand(in_c)], jnp.zeros_like(s))}
    return mask_new, corr_new, ys


def body_base(carry, w, tape2, wit2):
    mask2, corr2 = carry
    op = w["op"][:, None]
    cbit = w["cbit"].astype(U8)[:, None]
    m, c, ys = compute(
        op,
        jnp.take(mask2, w["a"], axis=0), jnp.take(corr2, w["a"], axis=0),
        jnp.take(mask2, w["b"], axis=0), jnp.take(corr2, w["b"], axis=0),
        jnp.take(tape2, w["t0"], axis=0), jnp.take(tape2, w["t1"], axis=0),
        jnp.take(wit2, w["wit"], axis=0), cbit)
    upd = jax.lax.optimization_barrier((m, c))
    mask2 = jax.lax.dynamic_update_slice_in_dim(mask2, upd[0], w["slot0"], axis=0)
    corr2 = jax.lax.dynamic_update_slice_in_dim(corr2, upd[1], w["slot0"], axis=0)
    return (mask2, corr2), ys


def body_u16fuse(carry, w, tape2, wit2):
    arena = carry
    W = w["op"].shape[0]
    op = w["op"][:, None]
    cbit = w["cbit"].astype(U8)[:, None]
    ab = jnp.take(arena, w["ab"], axis=0)        # (2W, R) u16, one gather
    amc, bmc = ab[:W], ab[W:]
    tt = jnp.take(tape2, w["tt"], axis=0)        # (2W, R) u8, one gather
    t0, t1 = tt[:W], tt[W:]
    m, c, ys = compute(
        op,
        (amc & 0xFF).astype(U8), (amc >> 8).astype(U8),
        (bmc & 0xFF).astype(U8), (bmc >> 8).astype(U8),
        t0, t1, jnp.take(wit2, w["wit"], axis=0), cbit)
    packed = m.astype(U16) | (c.astype(U16) << 8)
    packed = jax.lax.optimization_barrier(packed)
    arena = jax.lax.dynamic_update_slice_in_dim(arena, packed, w["slot0"], axis=0)
    return arena, ys


def run(name, NW, W, body, u16, unroll, iters=2):
    V2 = NW * W + 1
    xs = jax.block_until_ready(make_xs(NW, W, V2))
    if body is body_u16fuse:
        xs["ab"] = jnp.concatenate([xs["a"], xs["b"]], axis=1)
        xs["tt"] = jnp.concatenate([xs["t0"], xs["t1"]], axis=1)
        for k in ("a", "b", "t0", "t1"):
            del xs[k]
    tape2 = mk8(11, T)
    wit2 = mk8(13, 512)

    def outer(seed, xs, tape2, wit2):
        if u16:
            carry = jnp.full((V2, R), seed, U16) | (
                jnp.full((V2, R), seed ^ 1, U16) << 8)
        else:
            carry = (jnp.full((V2, R), seed, U8),
                     jnp.full((V2, R), seed ^ 1, U8))
        carry, ys = jax.lax.scan(
            lambda c, w: body(c, w, tape2, wit2), carry, xs, unroll=unroll)
        leaves = jax.tree_util.tree_leaves(carry)
        acc = sum(jnp.sum(l[:64].astype(jnp.uint32)) for l in leaves)
        for v in ys.values():
            acc = acc + jnp.sum(v[-1].astype(jnp.uint32))
        return acc

    f = jax.jit(outer)
    np.asarray(f(jnp.uint8(0), xs, tape2, wit2))
    best = 1e9
    for i in (1, 2):
        t0 = time.time()
        np.asarray(f(jnp.uint8(i), xs, tape2, wit2))
        best = min(best, time.time() - t0)
    print(f"{name:22s} {best*1e6/NW:8.1f} us/step   total {best:.3f}s",
          flush=True)


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    cases = [
        ("base", 5266, 64, body_base, False, 1),
        ("u16fuse", 5266, 64, body_u16fuse, True, 1),
        ("u16fuse_u4", 5266, 64, body_u16fuse, True, 4),
        ("u16fuse_w32", 5450, 32, body_u16fuse, True, 1),
        ("base_u4", 5266, 64, body_base, False, 4),
    ]
    for name, NW, W, body, u16, unroll in cases:
        if only and only not in name:
            continue
        run(name, NW, W, body, u16, unroll)
