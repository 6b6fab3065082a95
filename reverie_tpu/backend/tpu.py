"""TPU backend: levelized batched KKW execution in JAX/XLA.

Where the reference packs 8 reps x 8 players into one u64 and walks gates one
at a time (src/algebra/gf2/share.rs:13-15, src/interpreter/single.rs), this
backend executes every gate as a vector op over ALL repetitions at once:

  gf2 mask arena  : (V, R) uint8 -- byte r = 8 player bits of rep r
                    (bit 7-p = player p, matching the reference byte layout)
  gf2 corr arena  : (V, R) uint8 -- 0/1 per rep (LSB form; expanded to
                    0x00/0xFF only at transcript-byte emission)
  z64 mask arena  : (V, R, 8) uint32 pairs (lo, hi) -- player u64 shares
  z64 corr arena  : (V, R) uint32 pairs

R = total repetitions (256).  The transcript is materialized as byte tensors
(stream_len, R) whose rows are scattered at compile-time-assigned offsets, so
per-rep columns are byte-identical to the reference's sequential hasher
absorption; hashing the columns then yields identical commitments.

Execution is one jit-traced program: a Python-unrolled loop over levels, each
level a handful of gather -> vector-op -> scatter steps batched over that
level's gates x all reps.  Gate index tables are passed as runtime inputs
(not trace constants): million-gate circuits would otherwise embed
megabytes of constants into the HLO and blow up compilation.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import u64pair as up
from ..circuit.compile import (
    B2A_CORR,
    B2A_OUT,
    G_ADD,
    G_ADDC,
    G_ASSERT,
    G_CONST,
    G_INPUT,
    G_MUL,
    G_MULC,
    G_RANDOM,
    G_SUBC,
    GF2,
    N_KINDS,
    Z_SUB,
    CompiledCircuit,
)

U8 = jnp.uint8
U32 = jnp.uint32

PROVER = 0
VERIFY_ONL = 1
VERIFY_PRE = 2


def _parity8(x):
    t = x ^ (x >> 4)
    t = t ^ (t >> 2)
    t = t ^ (t >> 1)
    return t & jnp.asarray(1, U8)


def _expand(c):
    """0/1 uint8 -> 0x00/0xFF (recon hash byte form)."""
    return jnp.zeros_like(c) - c


def _scat(buf, rows, vals):
    # The optimization_barrier prevents XLA:TPU from fusing the producing
    # expression into the scatter -- the axon backend miscompiles certain
    # gather+bitops+scatter fusions (verified by differential test against
    # the CPU backend; barrier restores correctness at negligible cost).
    vals = jax.lax.optimization_barrier(vals)
    return buf.at[rows].set(vals)


def _recon_sum(lo, hi):
    """Sum u64 pairs over the trailing player axis: (k, R, 8) -> (k, R)."""
    alo, ahi = lo[..., 0], hi[..., 0]
    for p in range(1, lo.shape[-1]):
        alo, ahi = up.add64(alo, ahi, lo[..., p], hi[..., p])
    return alo, ahi


class Executor:
    """Jitted executor for one compiled circuit in one role.

    Gate tables are device arrays passed at call time; the traced program
    references them positionally via a flat name->array dict.
    """

    def __init__(self, cc: CompiledCircuit, mode: int, total_reps: int = 256,
                 mesh=None):
        self.cc = cc
        self.mode = mode
        self.R = total_reps
        self.mesh = mesh
        self.tables: Dict[str, np.ndarray] = {}
        self._prep_tables()
        # commit tables to device once (re-transferring megabytes of index
        # arrays per prove call would dominate small-circuit latency); under a
        # mesh the tables replicate across devices
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self.tables = jax.device_put(
                self.tables, NamedSharding(mesh, PartitionSpec())
            )
        else:
            self.tables = jax.device_put(self.tables)
        self._run = jax.jit(self._trace)

    # ------------------------------------------------------------------
    def _prep_tables(self) -> None:
        """Precompute per-level index/constant arrays (runtime inputs)."""
        for li, table in enumerate(self.cc.levels):
            for key, cols in table.items():
                domain, kind = divmod(key, N_KINDS)
                pre = f"{li}.{key}."
                for name, arr in cols.items():
                    if name == "const":
                        if domain == GF2:
                            self.tables[pre + "cbit"] = (arr & 1).astype(np.uint8)
                        else:
                            lo, hi = up.from_u64(arr)
                            self.tables[pre + "clo"] = lo
                            self.tables[pre + "chi"] = hi
                    else:
                        self.tables[pre + name] = np.asarray(arr, np.int32)
                # derived event-row arrays for z64 byte events
                if domain != GF2:
                    if kind in (G_MUL, G_ASSERT) and "onl" in cols:
                        base = cols["onl"]
                        self.tables[pre + "onl_rows"] = (
                            base[:, None] + np.arange(64)[None, :]
                        ).reshape(-1).astype(np.int32)
                    if kind in (G_MUL, B2A_CORR) and "pre" in cols:
                        base = cols["pre"]
                        self.tables[pre + "pre_rows"] = (
                            base[:, None] + np.arange(8)[None, :]
                        ).reshape(-1).astype(np.int32)
                    if kind == G_INPUT and "onl" in cols:
                        base = cols["onl"]
                        self.tables[pre + "onl_rows"] = (
                            base[:, None] + np.arange(8)[None, :]
                        ).reshape(-1).astype(np.int32)
                    if kind == B2A_OUT:
                        self.tables[pre + "onl_rows"] = (
                            cols["onl"][:, None] + np.arange(64)[None, :]
                        ).reshape(-1).astype(np.int32)
                        self.tables[pre + "rec_rows"] = (
                            cols["rec"][:, None] + np.arange(64)[None, :]
                        ).astype(np.int32)
                elif kind == G_MUL:
                    pass  # gf2 mul uses scalar slots directly

    # ------------------------------------------------------------------
    def __call__(self, inputs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        return self._run(dict(inputs), self.tables)

    # ------------------------------------------------------------------
    def _trace(self, inp, tables):
        cc, R = self.cc, self.R
        st = dict(
            mask2=jnp.zeros((cc.n_vals2, R), dtype=U8),
            corr2=jnp.zeros((cc.n_vals2, R), dtype=U8),
            mzlo=jnp.zeros((cc.n_valsz, R, 8), dtype=U32),
            mzhi=jnp.zeros((cc.n_valsz, R, 8), dtype=U32),
            czlo=jnp.zeros((cc.n_valsz, R), dtype=U32),
            czhi=jnp.zeros((cc.n_valsz, R), dtype=U32),
            onl2=jnp.zeros((max(cc.onl2, 1), R), dtype=U8),
            pre2=jnp.zeros((max(cc.pre2, 1), R), dtype=U8),
            onlz=jnp.zeros((max(cc.onlz, 1), R), dtype=U8),
            prez=jnp.zeros((max(cc.prez, 1), R), dtype=U8),
            fail=jnp.zeros((R,), dtype=jnp.bool_),
        )
        for li, table in enumerate(cc.levels):
            for key in sorted(table.keys()):
                domain, kind = divmod(key, N_KINDS)
                cols = {
                    name[len(f"{li}.{key}.") :]: tables[name]
                    for name in self._level_names(li, key)
                }
                if domain == GF2:
                    self._gf2_kind(st, inp, kind, cols)
                else:
                    self._z64_kind(st, inp, kind, cols)
        return {
            "onl2": st["onl2"],
            "pre2": st["pre2"],
            "onlz": st["onlz"],
            "prez": st["prez"],
            "fail": st["fail"],
        }

    def _level_names(self, li: int, key: int):
        pre = f"{li}.{key}."
        return [n for n in self.tables if n.startswith(pre)]

    # ------------------------------------------------------------------
    def _gf2_kind(self, st, inp, kind, cols):
        mode = self.mode
        mask2, corr2 = st["mask2"], st["corr2"]
        if kind == G_INPUT:
            m = jnp.take(inp["tape2"], cols["tape"], axis=0)
            if mode == PROVER:
                # wit2: (n_wit, R) -- per-lane witness (supports proof batching)
                wit = jnp.take(inp["wit2"], cols["wit"], axis=0)
                corr = wit ^ _parity8(m)
            elif mode == VERIFY_ONL:
                corr = jnp.take(inp["in2"], cols["rec"], axis=0)
            else:
                corr = jnp.zeros_like(m)
            if mode != VERIFY_PRE:
                st["onl2"] = _scat(st["onl2"], cols["onl"], _expand(corr))
            st["mask2"] = _scat(mask2, cols["dst"], m)
            st["corr2"] = _scat(corr2, cols["dst"], corr)
        elif kind == G_ADD:
            a = jnp.take(mask2, cols["a"], axis=0)
            b = jnp.take(mask2, cols["b"], axis=0)
            ac = jnp.take(corr2, cols["a"], axis=0)
            bc = jnp.take(corr2, cols["b"], axis=0)
            st["mask2"] = _scat(mask2, cols["dst"], a ^ b)
            st["corr2"] = _scat(corr2, cols["dst"], ac ^ bc)
        elif kind in (G_ADDC, G_SUBC):
            a = jnp.take(mask2, cols["a"], axis=0)
            ac = jnp.take(corr2, cols["a"], axis=0)
            cbit = cols["cbit"][:, None]
            st["mask2"] = _scat(mask2, cols["dst"], a)
            st["corr2"] = _scat(corr2, cols["dst"], ac ^ cbit)
        elif kind == G_MULC:
            a = jnp.take(mask2, cols["a"], axis=0)
            ac = jnp.take(corr2, cols["a"], axis=0)
            cbit = cols["cbit"][:, None]
            st["mask2"] = _scat(mask2, cols["dst"], a & _expand(cbit))
            st["corr2"] = _scat(corr2, cols["dst"], ac & cbit)
        elif kind == G_MUL:
            a = jnp.take(mask2, cols["a"], axis=0)
            b = jnp.take(mask2, cols["b"], axis=0)
            ac = jnp.take(corr2, cols["a"], axis=0)
            bc = jnp.take(corr2, cols["b"], axis=0)
            m_ab = jnp.take(inp["tape2"], cols["tape_ab"], axis=0)
            m_new = jnp.take(inp["tape2"], cols["tape_new"], axis=0)
            if mode == VERIFY_ONL:
                delta = jnp.take(inp["co2"], cols["corr"], axis=0)
            else:
                delta = (_parity8(a) & _parity8(b)) ^ _parity8(m_ab)
            st["pre2"] = _scat(st["pre2"], cols["pre"], _expand(delta))
            s = (b & _expand(ac)) ^ (a & _expand(bc)) ^ m_ab ^ m_new
            if mode == VERIFY_ONL:
                s = s ^ jnp.take(inp["re2"], cols["rec"], axis=0)
            if mode != VERIFY_PRE:
                st["onl2"] = _scat(st["onl2"], cols["onl"], s)
                recon = _parity8(s) ^ delta
            else:
                recon = jnp.zeros_like(s)  # junk (verifier/preprocess.rs:63-65)
            st["mask2"] = _scat(st["mask2"], cols["dst"], m_new)
            st["corr2"] = _scat(st["corr2"], cols["dst"], recon ^ (ac & bc))
        elif kind == G_ASSERT:
            if mode == VERIFY_PRE:
                return
            s = jnp.take(mask2, cols["a"], axis=0)
            ac = jnp.take(corr2, cols["a"], axis=0)
            if mode == VERIFY_ONL:
                s = s ^ jnp.take(inp["re2"], cols["rec"], axis=0)
            st["onl2"] = _scat(st["onl2"], cols["onl"], s)
            nonzero = (_parity8(s) ^ ac) != 0
            st["fail"] = st["fail"] | jnp.any(nonzero, axis=0)
        elif kind == G_RANDOM:
            m = jnp.take(inp["tape2"], cols["tape"], axis=0)
            st["mask2"] = _scat(mask2, cols["dst"], m)
        elif kind == G_CONST:
            vals = jnp.broadcast_to(cols["cbit"][:, None], (len(cols["cbit"]), self.R))
            st["corr2"] = _scat(corr2, cols["dst"], vals)
        else:
            raise ValueError(f"bad gf2 kind {kind}")

    # ------------------------------------------------------------------
    def _z64_kind(self, st, inp, kind, cols):
        mode = self.mode

        def gm(idx):
            return jnp.take(st["mzlo"], idx, axis=0), jnp.take(st["mzhi"], idx, axis=0)

        def gc(idx):
            return jnp.take(st["czlo"], idx, axis=0), jnp.take(st["czhi"], idx, axis=0)

        def put_mask(dst, lo, hi):
            st["mzlo"] = _scat(st["mzlo"], dst, lo)
            st["mzhi"] = _scat(st["mzhi"], dst, hi)

        def put_corr(dst, lo, hi):
            st["czlo"] = _scat(st["czlo"], dst, lo)
            st["czhi"] = _scat(st["czhi"], dst, hi)

        def tape_row(idx):
            return (
                jnp.take(inp["tapez_lo"], idx, axis=0),
                jnp.take(inp["tapez_hi"], idx, axis=0),
            )

        def const_pair():
            lo, hi = cols["clo"], cols["chi"]
            return (
                jnp.broadcast_to(lo[:, None], (lo.shape[0], self.R)),
                jnp.broadcast_to(hi[:, None], (hi.shape[0], self.R)),
            )

        def emit_bytes(buf_name, rows, lo, hi, nbytes):
            by = jnp.stack(up.le_bytes(lo, hi), axis=1)  # (k, 8, R)
            st[buf_name] = _scat(st[buf_name], rows, by.reshape(-1, self.R))

        if kind == G_INPUT:
            lo, hi = tape_row(cols["tape"])
            rlo, rhi = _recon_sum(lo, hi)
            if mode == PROVER:
                wlo = jnp.take(inp["witz_lo"], cols["wit"], axis=0)
                whi = jnp.take(inp["witz_hi"], cols["wit"], axis=0)
                clo, chi = up.sub64(wlo, whi, rlo, rhi)
            elif mode == VERIFY_ONL:
                clo = jnp.take(inp["inz_lo"], cols["rec"], axis=0)
                chi = jnp.take(inp["inz_hi"], cols["rec"], axis=0)
            else:
                clo = jnp.zeros_like(rlo)
                chi = jnp.zeros_like(rhi)
            if mode != VERIFY_PRE:
                emit_bytes("onlz", cols["onl_rows"], clo, chi, 8)
            put_mask(cols["dst"], lo, hi)
            put_corr(cols["dst"], clo, chi)
        elif kind in (G_ADD, Z_SUB):
            alo, ahi = gm(cols["a"])
            blo, bhi = gm(cols["b"])
            aclo, achi = gc(cols["a"])
            bclo, bchi = gc(cols["b"])
            fn = up.add64 if kind == G_ADD else up.sub64
            lo, hi = fn(alo, ahi, blo, bhi)
            clo, chi = fn(aclo, achi, bclo, bchi)
            put_mask(cols["dst"], lo, hi)
            put_corr(cols["dst"], clo, chi)
        elif kind in (G_ADDC, G_SUBC):
            alo, ahi = gm(cols["a"])
            aclo, achi = gc(cols["a"])
            klo, khi = const_pair()
            fn = up.add64 if kind == G_ADDC else up.sub64
            clo, chi = fn(aclo, achi, klo, khi)
            put_mask(cols["dst"], alo, ahi)
            put_corr(cols["dst"], clo, chi)
        elif kind == G_MULC:
            alo, ahi = gm(cols["a"])
            aclo, achi = gc(cols["a"])
            klo, khi = const_pair()
            lo, hi = up.mul64(alo, ahi, klo[..., None], khi[..., None])
            clo, chi = up.mul64(aclo, achi, klo, khi)
            put_mask(cols["dst"], lo, hi)
            put_corr(cols["dst"], clo, chi)
        elif kind == G_MUL:
            alo, ahi = gm(cols["a"])
            blo, bhi = gm(cols["b"])
            aclo, achi = gc(cols["a"])
            bclo, bchi = gc(cols["b"])
            tablo, tabhi = tape_row(cols["tape_ab"])
            tnlo, tnhi = tape_row(cols["tape_new"])
            ralo, rahi = _recon_sum(alo, ahi)
            rblo, rbhi = _recon_sum(blo, bhi)
            rclo, rchi = _recon_sum(tablo, tabhi)
            if mode == VERIFY_ONL:
                dlo = jnp.take(inp["coz_lo"], cols["corr"], axis=0)
                dhi = jnp.take(inp["coz_hi"], cols["corr"], axis=0)
            else:
                plo, phi = up.mul64(ralo, rahi, rblo, rbhi)
                dlo, dhi = up.sub64(plo, phi, rclo, rchi)
            emit_bytes("prez", cols["pre_rows"], dlo, dhi, 8)
            s1lo, s1hi = up.mul64(blo, bhi, aclo[..., None], achi[..., None])
            s2lo, s2hi = up.mul64(alo, ahi, bclo[..., None], bchi[..., None])
            slo, shi = up.add64(s1lo, s1hi, s2lo, s2hi)
            slo, shi = up.add64(slo, shi, tablo, tabhi)
            slo, shi = up.sub64(slo, shi, tnlo, tnhi)
            if mode == VERIFY_ONL:
                slo, shi = up.add64(
                    slo, shi,
                    jnp.take(inp["rez_lo"], cols["rec"], axis=0),
                    jnp.take(inp["rez_hi"], cols["rec"], axis=0),
                )
            if mode != VERIFY_PRE:
                by = jnp.stack(up.le_bytes(slo, shi), axis=-1)  # (k, R, 8p, 8b)
                by = jnp.moveaxis(by, 1, -1)  # (k, 8p, 8b, R)
                st["onlz"] = _scat(st["onlz"], cols["onl_rows"], by.reshape(-1, self.R))
                srlo, srhi = _recon_sum(slo, shi)
                relo, rehi = up.add64(srlo, srhi, dlo, dhi)
            else:
                relo = jnp.zeros_like(dlo)
                rehi = jnp.zeros_like(dhi)
            pclo, pchi = up.mul64(aclo, achi, bclo, bchi)
            clo, chi = up.add64(relo, rehi, pclo, pchi)
            put_mask(cols["dst"], tnlo, tnhi)
            put_corr(cols["dst"], clo, chi)
        elif kind == G_ASSERT:
            if mode == VERIFY_PRE:
                return
            slo, shi = gm(cols["a"])
            aclo, achi = gc(cols["a"])
            if mode == VERIFY_ONL:
                slo, shi = up.add64(
                    slo, shi,
                    jnp.take(inp["rez_lo"], cols["rec"], axis=0),
                    jnp.take(inp["rez_hi"], cols["rec"], axis=0),
                )
            by = jnp.stack(up.le_bytes(slo, shi), axis=-1)
            by = jnp.moveaxis(by, 1, -1)
            st["onlz"] = _scat(st["onlz"], cols["onl_rows"], by.reshape(-1, self.R))
            rlo, rhi = _recon_sum(slo, shi)
            vlo, vhi = up.add64(rlo, rhi, aclo, achi)
            st["fail"] = st["fail"] | jnp.any((vlo | vhi) != 0, axis=0)
        elif kind == G_RANDOM:
            lo, hi = tape_row(cols["tape"])
            put_mask(cols["dst"], lo, hi)
        elif kind == G_CONST:
            klo, khi = const_pair()
            put_corr(cols["dst"], klo, khi)
        elif kind == B2A_CORR:
            bits = _parity8(jnp.take(st["mask2"], cols["bits"], axis=0))
            vlo, vhi = _compose_bits(bits)
            lo, hi = tape_row(cols["tape"])
            rlo, rhi = _recon_sum(lo, hi)
            if mode == VERIFY_ONL:
                clo = jnp.take(inp["coz_lo"], cols["corr"], axis=0)
                chi = jnp.take(inp["coz_hi"], cols["corr"], axis=0)
            else:
                clo, chi = up.sub64(vlo, vhi, rlo, rhi)
            emit_bytes("prez", cols["pre_rows"], clo, chi, 8)
            put_mask(cols["dst"], lo, hi)
            put_corr(cols["dst"], clo, chi)
        elif kind == B2A_OUT:
            ids = cols["bits"]  # (k, 64)
            s = jnp.take(st["mask2"], ids, axis=0)  # (k, 64, R)
            bc = jnp.take(st["corr2"], ids, axis=0)
            if mode == VERIFY_ONL:
                s = s ^ jnp.take(inp["re2"], cols["rec_rows"], axis=0)
            if mode != VERIFY_PRE:
                st["onl2"] = _scat(st["onl2"], cols["onl_rows"], s.reshape(-1, self.R))
                bits = _parity8(s) ^ bc
            else:
                bits = bc  # junk: recon is zero in preprocess mode
            vlo, vhi = _compose_bits(bits)
            zrlo, zrhi = gm(cols["zr"])
            zclo, zchi = gc(cols["zr"])
            nlo, nhi = up.neg64(zrlo, zrhi)
            clo, chi = up.sub64(vlo, vhi, zclo, zchi)
            put_mask(cols["dst"], nlo, nhi)
            put_corr(cols["dst"], clo, chi)
        else:
            raise ValueError(f"bad z64 kind {kind}")


def _compose_bits(bits):
    """(k, 64, R) 0/1 uint8 -> u64 pair (k, R): bit i = wire i (LE)."""
    b = bits.astype(U32)
    w = jnp.asarray((1 << np.arange(32)).astype(np.uint32))
    lo = jnp.sum(b[:, :32, :] * w[None, :, None], axis=1, dtype=U32)
    hi = jnp.sum(b[:, 32:, :] * w[None, :, None], axis=1, dtype=U32)
    return lo, hi
