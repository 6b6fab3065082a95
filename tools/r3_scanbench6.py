"""Part 6: prototype the restructured fast2 body at the SHA-batch shape.

Variants (full PROVER semantics, same math as _scan_trace_fast2):
  current    — 7 takes + 2 DUS (replica from part 4)
  tape-xs    — tape rows pre-gathered to wave order outside the scan and fed
               through xs (scan's native slicing): 5 takes + 2 DUS
  u16        — mask|corr packed into one u16 arena: 3 takes + 1 DUS
  u16+tapexs — both: 2 arena takes + 1 wit take + 1 DUS
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
NW, W, R, T = 2048, 64, 4096, 65536
V2 = NW * W + 1

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


make_xs = jax.jit(lambda: {
    "op": dev_idx((NW, W), 6, 1),
    "a": dev_idx((NW, W), V2, 2),
    "b": dev_idx((NW, W), V2, 3),
    "t0": dev_idx((NW, W), T, 4),
    "t1": dev_idx((NW, W), T, 5),
    "wit": dev_idx((NW, W), 512, 6),
    "cbit": dev_idx((NW, W), 2, 7),
    "slot0": 1 + jnp.arange(NW, dtype=jnp.int32) * W,
})
xs = jax.block_until_ready(make_xs())
mk8 = jax.jit(lambda salt, n: (
    (jnp.arange(n, dtype=jnp.uint32)[:, None] * 131
     + jnp.arange(R, dtype=jnp.uint32)[None, :] * 7 + salt) & 0xFF
).astype(jnp.uint8), static_argnums=(1,))
tape2_dev = jax.block_until_ready(mk8(11, T))
wit2_dev = jax.block_until_ready(mk8(13, 512))


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


def body_current(carry, w, tape2, wit2):
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


def body_tapexs(carry, w, tape2, wit2):
    mask2, corr2 = carry
    op = w["op"][:, None]
    cbit = w["cbit"].astype(U8)[:, None]
    m, c, ys = compute(
        op,
        jnp.take(mask2, w["a"], axis=0), jnp.take(corr2, w["a"], axis=0),
        jnp.take(mask2, w["b"], axis=0), jnp.take(corr2, w["b"], axis=0),
        w["t0r"], w["t1r"],
        jnp.take(wit2, w["wit"], axis=0), cbit)
    upd = jax.lax.optimization_barrier((m, c))
    mask2 = jax.lax.dynamic_update_slice_in_dim(mask2, upd[0], w["slot0"], axis=0)
    corr2 = jax.lax.dynamic_update_slice_in_dim(corr2, upd[1], w["slot0"], axis=0)
    return (mask2, corr2), ys


def body_u16(carry, w, tape2, wit2, tape_in_xs):
    arena = carry
    op = w["op"][:, None]
    cbit = w["cbit"].astype(U8)[:, None]
    amc = jnp.take(arena, w["a"], axis=0)
    bmc = jnp.take(arena, w["b"], axis=0)
    if tape_in_xs:
        t0, t1 = w["t0r"], w["t1r"]
    else:
        t0 = jnp.take(tape2, w["t0"], axis=0)
        t1 = jnp.take(tape2, w["t1"], axis=0)
    m, c, ys = compute(
        op,
        (amc & 0xFF).astype(U8), (amc >> 8).astype(U8),
        (bmc & 0xFF).astype(U8), (bmc >> 8).astype(U8),
        t0, t1, jnp.take(wit2, w["wit"], axis=0), cbit)
    packed = m.astype(U16) | (c.astype(U16) << 8)
    packed = jax.lax.optimization_barrier(packed)
    arena = jax.lax.dynamic_update_slice_in_dim(arena, packed, w["slot0"], axis=0)
    return arena, ys


def run(name, mk_carry, body, with_tape_xs):
    def outer(seed, xs, tape2, wit2):
        if with_tape_xs:
            flat0 = jnp.take(tape2, xs["t0"].reshape(-1), axis=0)
            flat1 = jnp.take(tape2, xs["t1"].reshape(-1), axis=0)
            xs = dict(xs, t0r=flat0.reshape(NW, W, R),
                      t1r=flat1.reshape(NW, W, R))
        carry = mk_carry(seed)
        carry, ys = jax.lax.scan(
            lambda c, w: body(c, w, tape2, wit2), carry, xs)
        leaves = jax.tree_util.tree_leaves(carry)
        acc = sum(jnp.sum(l[:64].astype(jnp.uint32)) for l in leaves)
        for v in ys.values():
            acc = acc + jnp.sum(v[-1].astype(jnp.uint32))
        return acc

    f = jax.jit(outer)
    np.asarray(f(jnp.uint8(0), xs, tape2_dev, wit2_dev))
    best = 1e9
    for i in (1, 2):
        t0 = time.time()
        np.asarray(f(jnp.uint8(i), xs, tape2_dev, wit2_dev))
        best = min(best, time.time() - t0)
    print(f"{name:22s} {best*1e6/NW:8.1f} us/step   total {best:.3f}s",
          flush=True)


two8 = lambda seed: (jnp.full((V2, R), seed, U8), jnp.full((V2, R), seed ^ 1, U8))
one16 = lambda seed: jnp.full((V2, R), seed, U16) | (jnp.full((V2, R), seed ^ 1, U16) << 8)

run("current (part-4)", two8, body_current, False)
run("tape-xs", two8, body_tapexs, True)
run("u16", one16, lambda c, w, t, wt: body_u16(c, w, t, wt, False), False)
run("u16+tapexs", one16, lambda c, w, t, wt: body_u16(c, w, t, wt, True), True)
