"""Scan-mode executor for deep circuits (e.g. SHA-256: ~5200 levels).

The unrolled executor (backend/tpu.py) emits one XLA op sequence per level --
intractable to compile for thousands of levels.  This executor instead runs a
`lax.scan` over uniform fixed-width gate "waves" (circuit/compile.build_waves)
with a single compiled body: every slot carries a unified gate encoding and
the body computes all gate families and selects by opcode.  Slots that don't
produce a result write to trash rows (dst = V, event slot = T), keeping the
body fully uniform.

GF2-only (z64/B2A circuits use the unrolled executor).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit.compile import (
    G_ADD,
    G_ADDC,
    G_ASSERT,
    G_CONST,
    G_INPUT,
    G_MUL,
    G_MULC,
    G_RANDOM,
    G_SUBC,
    CompiledCircuit,
    WaveTable,
    build_waves,
)
from .tpu import PROVER, VERIFY_ONL, VERIFY_PRE, _expand, _parity8

U8 = jnp.uint8


class ScanExecutor:
    """Jitted scan-mode executor for one compiled circuit in one role."""

    def __init__(self, cc: CompiledCircuit, mode: int, total_reps: int = 256,
                 wave_width: int = 0, mesh=None):
        if cc.n_valsz > 1 or cc.mz > 0:
            raise ValueError("scan mode is GF2-only")
        self.cc = cc
        self.mode = mode
        self.R = total_reps
        self.mesh = mesh
        if wave_width <= 0:
            # adapt the wave width to the mean level occupancy: wide enough to
            # swallow typical levels, narrow enough to avoid NOP-padding waste
            n_gates = sum(
                len(next(iter(cols.values())))
                for lvl in cc.levels
                for cols in lvl.values()
            )
            mean = max(1, n_gates // max(1, cc.depth))
            wave_width = 8
            while wave_width < min(256, 2 * mean):
                wave_width *= 2
        self.waves = build_waves(cc, wave_width)
        xs_host = {
            k: np.asarray(getattr(self.waves, k)) for k in (
                "op", "dst", "a", "b", "t0", "t1", "wit", "inrec", "rec", "corr",
                "onl", "pre", "cbit")
        }
        if mesh is not None:
            # wave tables replicate across the mesh; the rep axis of the
            # inputs/carry is sharded (parallel/mesh.py) and propagates
            # through the scan (all ops are elementwise or axis-0 gathers)
            from jax.sharding import NamedSharding, PartitionSpec

            self.xs = jax.device_put(xs_host, NamedSharding(mesh, PartitionSpec()))
        else:
            self.xs = jax.device_put(xs_host)
        self._run = jax.jit(self._trace)

    def __call__(self, inputs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = self._run(dict(inputs), self.xs)
        R = self.R
        # present the same output dict as the unrolled executor
        return {
            "onl2": out["onl2"],
            "pre2": out["pre2"],
            "onlz": jnp.zeros((1, R), U8),
            "prez": jnp.zeros((1, R), U8),
            "fail": out["fail"],
        }

    def _trace(self, inp, xs):
        cc, mode, R = self.cc, self.mode, self.R

        mask2 = jnp.zeros((cc.n_vals2 + 1, R), U8)  # +1 trash row
        corr2 = jnp.zeros((cc.n_vals2 + 1, R), U8)
        onl2 = jnp.zeros((cc.onl2 + 1, R), U8)
        pre2 = jnp.zeros((cc.pre2 + 1, R), U8)
        fail = jnp.zeros((R,), jnp.bool_)

        tape2 = inp["tape2"]
        wit2 = inp.get("wit2")
        in2 = inp.get("in2")
        co2 = inp.get("co2")
        re2 = inp.get("re2")

        def body(carry, w):
            mask2, corr2, onl2, pre2, fail = carry
            op = w["op"][:, None]  # (W, 1)
            a_m = jnp.take(mask2, w["a"], axis=0)
            a_c = jnp.take(corr2, w["a"], axis=0)
            b_m = jnp.take(mask2, w["b"], axis=0)
            b_c = jnp.take(corr2, w["b"], axis=0)
            t0 = jnp.take(tape2, w["t0"], axis=0)
            t1 = jnp.take(tape2, w["t1"], axis=0)
            cbit = w["cbit"].astype(U8)[:, None]

            # ---- MUL family -----------------------------------------------
            if mode == VERIFY_ONL:
                delta = jnp.take(co2, w["corr"], axis=0)
            else:
                delta = (_parity8(a_m) & _parity8(b_m)) ^ _parity8(t0)
            s = (b_m & _expand(a_c)) ^ (a_m & _expand(b_c)) ^ t0 ^ t1
            if mode == VERIFY_ONL:
                msg = jnp.take(re2, w["rec"], axis=0)
                s = s ^ msg
            if mode != VERIFY_PRE:
                recon = _parity8(s) ^ delta
            else:
                recon = jnp.zeros_like(s)
            mul_corr = recon ^ (a_c & b_c)

            # ---- INPUT ----------------------------------------------------
            if mode == PROVER:
                in_c = jnp.take(wit2, w["wit"], axis=0) ^ _parity8(t0)
            elif mode == VERIFY_ONL:
                in_c = jnp.take(in2, w["inrec"], axis=0)
            else:
                in_c = jnp.zeros_like(a_c)

            # ---- ASSERT ---------------------------------------------------
            s_assert = a_m
            if mode == VERIFY_ONL:
                s_assert = s_assert ^ msg
            if mode != VERIFY_PRE:
                a_nonzero = (_parity8(s_assert) ^ a_c) != 0
                fail = fail | jnp.any((op == G_ASSERT) & a_nonzero, axis=0)

            # ---- result selection ----------------------------------------
            mask_new = jnp.select(
                [op == G_MUL, op == G_INPUT, op == G_ADD,
                 (op == G_ADDC) | (op == G_SUBC), op == G_MULC,
                 op == G_RANDOM],
                [t1, t0, a_m ^ b_m, a_m, a_m & _expand(cbit), t0],
                jnp.zeros_like(a_m),
            )
            corr_new = jnp.select(
                [op == G_MUL, op == G_INPUT, op == G_ADD,
                 (op == G_ADDC) | (op == G_SUBC), op == G_MULC,
                 op == G_CONST],
                [mul_corr, in_c, a_c ^ b_c, a_c ^ cbit, a_c & cbit, cbit],
                jnp.zeros_like(a_c),
            )

            # ---- scatters -------------------------------------------------
            mask_new, corr_new = jax.lax.optimization_barrier((mask_new, corr_new))
            mask2 = mask2.at[w["dst"]].set(mask_new)
            corr2 = corr2.at[w["dst"]].set(corr_new)

            if mode != VERIFY_PRE:
                onl_val = jnp.select(
                    [op == G_MUL, op == G_ASSERT, op == G_INPUT],
                    [s, s_assert, _expand(in_c)],
                    jnp.zeros_like(s),
                )
                onl_val = jax.lax.optimization_barrier(onl_val)
                onl2 = onl2.at[w["onl"]].set(onl_val)
            pre_val = jax.lax.optimization_barrier(_expand(delta))
            pre2 = pre2.at[w["pre"]].set(pre_val)

            return (mask2, corr2, onl2, pre2, fail), None

        carry = (mask2, corr2, onl2, pre2, fail)
        (mask2, corr2, onl2, pre2, fail), _ = jax.lax.scan(body, carry, xs)
        return {"onl2": onl2[:-1], "pre2": pre2[:-1], "fail": fail}
