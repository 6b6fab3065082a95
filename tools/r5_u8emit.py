"""Round 5: can Mosaic emit u8 byte-interleaved planes from u32 words
in-kernel, and at what cost?

The fused tape+execute jit spends ~8-10 ms relaying the AES kernel's u32
words into the executor's u8 (rows, R) planes (XLA relayout at ~85-125 GB/s
over 512 MB).  If the kernel can write the u8 planes directly (byte b of
word k -> lane 4k+b), the relayout disappears.

Part 1: minimal pallas kernel: (T, 128) u32 -> (T, 2, 256) u8 via
        lax.bitcast_convert_type + reshape; check vs numpy; fallbacks if
        Mosaic rejects the bitcast.
Part 2: timing at the 1M-tape shape vs the u32-emit + XLA-tail baseline.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

U8, U32 = jnp.uint8, jnp.uint32


def kern_bitcast(x_ref, o_ref):
    w = x_ref[...]  # (T, 128) u32
    T = w.shape[0]
    w8 = jax.lax.bitcast_convert_type(w, jnp.uint8)  # (T, 128, 4)
    w8 = w8.reshape(T, 512)
    o_ref[:, 0, :] = w8[:, 0:256]
    o_ref[:, 1, :] = w8[:, 256:512]


def kern_shift(x_ref, o_ref):
    w = x_ref[...]  # (T, 128) u32
    T = w.shape[0]
    parts = [(w >> np.uint32(8 * b)).astype(U8) for b in range(4)]
    w8 = jnp.stack(parts, axis=-1).reshape(T, 512)  # lane 4k+b = byte b of k
    o_ref[:, 0, :] = w8[:, 0:256]
    o_ref[:, 1, :] = w8[:, 256:512]


def run_check(kern, name, T=64):
    x = np.arange(T * 128, dtype=np.uint32).reshape(T, 128) * np.uint32(2654435761)
    want = x.view(np.uint8).reshape(T, 2, 256)  # little-endian byte order
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T, 2, 256), jnp.uint8),
            grid=(1,),
            in_specs=[pl.BlockSpec((T, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, 2, 256), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(jnp.asarray(x))
        out = np.asarray(out)
        ok = np.array_equal(out, want)
        print(f"{name}: compiled, byte-exact={ok}")
        return ok
    except Exception as e:
        print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:300]}")
        return False




def kern_concat(x_ref, o_ref):
    # sigma-permuted layout: out lane b*64+k = byte b of word g*64+k
    w = x_ref[...]  # (T, 128) u32
    T = w.shape[0]
    parts = [(w >> np.uint32(8 * b)).astype(U8) for b in range(4)]
    for g in range(2):
        o_ref[:, g, :] = jnp.concatenate(
            [p[:, g * 64:(g + 1) * 64] for p in parts], axis=1)


def kern_interleave_roll(x_ref, o_ref):
    # exact rep order via per-part shifted iota select (no reshape):
    # out lane c = byte (c%4) of word (c//4):
    # build from 4 arrays each broadcast to 512 lanes? too clever; skip
    pass


def run_check2(kern, name, T=64, perm=False):
    x = np.arange(T * 128, dtype=np.uint32).reshape(T, 128) * np.uint32(2654435761)
    if perm:
        # sigma layout: [t, g, b*64+k] = byte b of word g*64+k
        by = x.view(np.uint8).reshape(T, 128, 4)  # [t, word, byte]
        want = np.zeros((T, 2, 256), np.uint8)
        for g in range(2):
            for b in range(4):
                want[:, g, b * 64:(b + 1) * 64] = by[:, g * 64:(g + 1) * 64, b]
    else:
        want = x.view(np.uint8).reshape(T, 2, 256)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T, 2, 256), jnp.uint8),
            grid=(1,),
            in_specs=[pl.BlockSpec((T, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, 2, 256), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(jnp.asarray(x))
        out = np.asarray(out)
        ok = np.array_equal(out, want)
        print(f"{name}: compiled, byte-exact={ok}")
        return ok
    except Exception as e:
        print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:500]}")
        return False




def kern_repeat(x_ref, o_ref):
    # exact rep order: out lane 4k+b = byte b of word k, via lane-repeat + mask
    w = x_ref[...]  # (T, 128) u32
    T = w.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.uint8, (T, 512), 1)
    sel = lane & jnp.uint8(3)
    out = jnp.zeros((T, 512), U8)
    for b in range(4):
        p = (w >> np.uint32(8 * b)).astype(U8)
        pr = jnp.repeat(p, 4, axis=1)  # lane c -> p[c//4]
        out = jnp.where(sel == jnp.uint8(b), pr, out)
    o_ref[:, 0, :] = out[:, 0:256]
    o_ref[:, 1, :] = out[:, 256:512]

if __name__ == "__main__":
    print("devices:", jax.devices())
    ok2 = run_check(kern_shift, "shift+stack+reshape")
    ok3 = run_check2(kern_concat, "shift+concat (sigma-permuted)", perm=True)
    ok4 = run_check2(kern_repeat, "repeat+mask (exact order)", perm=False)
