"""Streaming segmented prover for beyond-HBM circuits (SURVEY §7 hard-part 5).

The reference holds the whole wire arena and all transcript streams in RAM
for the duration of a proof (interpreter/combine.rs SizeHint arena growth;
proof/mod.rs:118-196).  On a TPU the equivalent would pin O(circuit) HBM;
instead the op list is split into segments (circuit/compile.py:
compile_segments) and proved in two passes with O(segment) device memory:

  pass 1 (hash): execute segments in order, carrying the cross-segment live
    wires (mask/correction arena rows) on device; each segment's transcript
    stream bytes are absorbed into incremental per-rep BLAKE3 states
    (crypto/kernels/blake3_jax.py:ColumnHasher) and then discarded.  This
    yields the per-rep commitments -> Fiat-Shamir challenge, byte-identical
    to unsegmented proving.
  pass 2 (extract): re-execute every segment with the same carried state and
    pull only the opened repetitions' recon/corr/input bits, accumulating
    them on host; one final bit-pack produces the proof streams.

Re-execution trades ~1x extra compute for never materializing a full stream
(the alternative -- spooling all streams to host -- is bounded by the
~30 MB/s device tunnel, not by the chip).  Segment executors are the regular
levelized Executors (backend/tpu.py) with carry_in/carry_out; uniform
segments share jit cache entries because gate tables are runtime inputs.

GF2-only circuits for now (the flagship SHA-256 / AND-tree statements);
z64/B2A segments would carry z64 arena rows the same way.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..circuit.compile import Segment, compile_segments
from ..circuit.ir import CombineOp
from ..crypto import blake3, expand_seeds, keystream_batch
from ..params import DEFAULT_PARAMS, KEY_SIZE, ProtocolParams
from ..proof.challenge import challenge_to_opening
from ..proof.container import OpenOnline, OpenPreprocessing, Proof, ProofSingle
from .tpu import PROVER, Executor
from .tpu_host import BATCH, GF2_BATCH_BYTES, _pack_bits_stream

U64 = np.uint64


def _tape2_window_host(player_keys: np.ndarray, tape0: int, m2s: int) -> np.ndarray:
    """(m2s, R) GF2 tape rows [tape0, tape0+m2s) via host AES (CPU path /
    small segments).  Layout identical to tpu_host.build_tapes."""
    R = player_keys.shape[0]
    if m2s == 0:
        return np.zeros((0, R), np.uint8)
    flat = player_keys.reshape(R * 8, KEY_SIZE)
    b0 = tape0 // BATCH
    b1 = (tape0 + m2s + BATCH - 1) // BATCH
    ks = keystream_batch(flat, (b1 - b0) * GF2_BATCH_BYTES, start_block=b0)
    ks = ks.reshape(R, 8, -1)
    bits = np.unpackbits(ks, axis=-1)  # (R, 8, (b1-b0)*128)
    off = tape0 - b0 * BATCH
    bits = bits[:, :, off : off + m2s]
    return np.packbits(bits.transpose(2, 0, 1), axis=-1)[..., 0]  # (m2s, R)


class StreamingKKW:
    """Segmented streaming prover.  Proof bytes are identical to
    TpuKKW.prove on the same seeds (tests/test_streaming.py)."""

    def __init__(self, program: Sequence[CombineOp], seg_ops: int,
                 params: ProtocolParams = DEFAULT_PARAMS):
        self.params = params
        self.segments: List[Segment] = compile_segments(program, seg_ops)
        self.m2 = sum(s.cc.m2 for s in self.segments)
        self.n_wit2 = sum(s.cc.n_wit2 for s in self.segments)
        self.onl_total = sum(s.cc.onl2 for s in self.segments)
        self.pre_total = sum(s.cc.pre2 for s in self.segments)
        self.rec_total = sum(s.cc.n_recons2 for s in self.segments)
        self.cor_total = sum(s.cc.n_corrs2 for s in self.segments)
        self.inp_total = sum(s.cc.n_inputs2 for s in self.segments)
        self._executors: Dict[int, Executor] = {}
        self._bitx: Dict[int, object] = {}
        self._use_device_tape = None

    # ------------------------------------------------------------------
    def _executor(self, s: int, R: int) -> Executor:
        if s not in self._executors:
            seg = self.segments[s]
            self._executors[s] = Executor(
                seg.cc, PROVER, total_reps=R,
                carry_in=len(seg.carry_in), carry_out_vals=seg.carry_out_vals,
            )
        return self._executors[s]

    def _tape2_window(self, s: int, rkp, mask, player_keys) -> "object":
        """Device (m2s, R) tape rows for segment s."""
        import jax

        seg = self.segments[s]
        m2s = seg.cc.m2
        R = player_keys.shape[0]
        if self._use_device_tape is None:
            self._use_device_tape = (
                jax.default_backend() == "tpu" and (R * 8) % 32 == 0
            )
        if not self._use_device_tape or m2s < 4096:
            return _tape2_window_host(player_keys, seg.tape0, m2s)
        import jax.numpy as jnp

        from ..crypto.kernels import aes_jax as aj

        b0 = seg.tape0 // BATCH
        b1 = (seg.tape0 + m2s + BATCH - 1) // BATCH
        if "aes" not in self._bitx:
            self._bitx["aes"] = jax.jit(aj.aes_ctr_tape_gf2)
        ctrp = aj.counter_planes(b1 - b0, start_block=b0)
        rows = self._bitx["aes"](rkp, jnp.asarray(ctrp), mask)
        off = seg.tape0 - b0 * BATCH
        return rows[off : off + m2s]

    def _bit_extractor(self, s: int):
        """Jitted fn: (onl2, pre2, shifts(R,), cols(K,)) -> flat u8 of the
        *packed* opened bit rows [recons | corrs | inputs], 8 bits/byte
        MSB-first per stream (host unpacks and re-aligns across segments;
        packing before the pull keeps the tunnel transfer at proof size)."""
        if ("bx", s) not in self._bitx:
            import jax
            import jax.numpy as jnp

            from .tpu_host import _pack_rows_device

            cc = self.segments[s].cc
            rec = jnp.asarray(cc.recon_slots2.astype(np.int32))
            cor = jnp.asarray(cc.corr_slots2.astype(np.int32))
            inp = jnp.asarray(cc.input_slots2.astype(np.int32))

            def fn(onl2, pre2, shifts, cols):
                rb = (jnp.take(onl2, rec, axis=0) >> shifts[None, :]) & jnp.uint8(1)
                cb = jnp.take(pre2, cor, axis=0) & jnp.uint8(1)
                ib = jnp.take(onl2, inp, axis=0) & jnp.uint8(1)
                return jnp.concatenate(
                    [
                        _pack_rows_device(jnp.take(b, cols, axis=1)).reshape(-1)
                        for b in (rb, cb, ib)
                    ]
                )

            self._bitx[("bx", s)] = jax.jit(fn)
        return self._bitx[("bx", s)]

    # ------------------------------------------------------------------
    def _run_segments(self, player_keys, wit2, rkp, mask, on_out):
        """Execute all segments in order, calling on_out(s, out) per segment.
        Returns the final fail flags (R,) as a device array."""
        import jax.numpy as jnp

        R = player_keys.shape[0]
        carry_store: List[tuple] = [None] * len(self.segments)
        fail = None
        for s, seg in enumerate(self.segments):
            cc = seg.cc
            inp = dict(
                tape2=self._tape2_window(s, rkp, mask, player_keys),
                tapez_lo=np.zeros((0, R, 8), np.uint32),
                tapez_hi=np.zeros((0, R, 8), np.uint32),
                wit2=np.ascontiguousarray(
                    np.broadcast_to(
                        wit2[seg.wit0 : seg.wit0 + cc.n_wit2, None],
                        (cc.n_wit2, R),
                    )
                ),
                witz_lo=np.zeros((0, R), np.uint32),
                witz_hi=np.zeros((0, R), np.uint32),
            )
            if seg.carry_in:
                # one gather per source segment, then one inverse-perm take
                by_src: Dict[int, List[int]] = {}
                pos_order: List[int] = []
                for pos, (src, row) in enumerate(seg.carry_src):
                    by_src.setdefault(src, []).append(row)
                srcs = sorted(by_src)
                for src in srcs:
                    pos_order.extend(
                        p for p, (sv, _) in enumerate(seg.carry_src) if sv == src
                    )
                inv = np.empty(len(pos_order), np.int32)
                inv[np.asarray(pos_order, np.int32)] = np.arange(
                    len(pos_order), dtype=np.int32
                )
                parts_m = [
                    jnp.take(carry_store[src][0],
                             jnp.asarray(np.asarray(by_src[src], np.int32)), axis=0)
                    for src in srcs
                ]
                parts_c = [
                    jnp.take(carry_store[src][1],
                             jnp.asarray(np.asarray(by_src[src], np.int32)), axis=0)
                    for src in srcs
                ]
                jinv = jnp.asarray(inv)
                inp["carry_mask2"] = jnp.take(
                    jnp.concatenate(parts_m, axis=0), jinv, axis=0
                )
                inp["carry_corr2"] = jnp.take(
                    jnp.concatenate(parts_c, axis=0), jinv, axis=0
                )
            out = self._executor(s, R)(inp)
            if seg.carry_out:
                carry_store[s] = (out["carry_mask2"], out["carry_corr2"])
            fail = out["fail"] if fail is None else (fail | out["fail"])
            on_out(s, out)
        return fail

    # ------------------------------------------------------------------
    def prove(self, wit_gf2, wit_z64=(), seeds: Optional[np.ndarray] = None) -> Proof:
        import jax
        import jax.numpy as jnp

        from ..crypto.kernels.blake3_jax import ColumnHasher, hash_pair_columns
        from ..utils.profiling import PhaseTimer

        timer = PhaseTimer()
        profile = bool(os.environ.get("REVERIE_PROFILE"))
        params = self.params
        R = params.total_reps

        if seeds is None:
            seeds = np.frombuffer(
                os.urandom(R * KEY_SIZE), dtype=np.uint8
            ).reshape(R, KEY_SIZE)
        seeds = np.ascontiguousarray(seeds, dtype=np.uint8).reshape(R, KEY_SIZE)
        player_keys = expand_seeds(seeds).reshape(R, 8, KEY_SIZE)

        wit2 = np.asarray([1 if b else 0 for b in wit_gf2], dtype=np.uint8)
        if len(wit2) < self.n_wit2:
            raise AssertionError("witness is too short")

        rkp = mask = None
        if jax.default_backend() == "tpu" and (R * 8) % 32 == 0:
            from ..crypto.kernels import aes_jax as aj

            rkp = jnp.asarray(aj.round_key_planes(player_keys.reshape(-1, KEY_SIZE)))
            mask = jnp.asarray(np.full(R * 8 // 32, 0xFFFFFFFF, np.uint32))

        # ---- pass 1: execute + absorb + discard ---------------------------
        onl_h = ColumnHasher(self.onl_total, R)
        pre_h = ColumnHasher(self.pre_total, R)

        def absorb(s, out):
            cc = self.segments[s].cc
            if cc.onl2:
                onl_h.absorb(out["onl2"][: cc.onl2])
            if cc.pre2:
                pre_h.absorb(out["pre2"][: cc.pre2])

        with timer.phase("pass1"):
            fail = self._run_segments(player_keys, wit2, rkp, mask, absorb)

        with timer.phase("hash_final"):
            ho2 = onl_h.finalize()
            hp2 = pre_h.finalize()
            empty = ColumnHasher(0, R).finalize()  # blake3("") rows
            h2 = hash_pair_columns(hp2, ho2)
            hz = hash_pair_columns(empty, empty)
            rep_h = np.asarray(hash_pair_columns(h2, hz))
            ho2_np = np.asarray(ho2)
            if np.asarray(fail).any():
                raise AssertionError("witness is invalid (AssertZero failed)")

        with timer.phase("challenge"):
            comm = blake3(rep_h.tobytes())
        open_map = challenge_to_opening(comm, params)
        omit = np.full(R, 8, dtype=np.int64)
        for rep, p in open_map.items():
            omit[rep] = p
        cols = np.nonzero(omit < 8)[0]
        K = len(cols)
        shifts = np.zeros(R, dtype=np.uint8)
        shifts[cols] = (7 - omit[cols]).astype(np.uint8)
        jshifts = jnp.asarray(shifts)
        jcols = jnp.asarray(cols.astype(np.int32))

        # ---- pass 2: re-execute + pull opened bits ------------------------
        rec_bits = np.zeros((self.rec_total, K), np.uint8)
        cor_bits = np.zeros((self.cor_total, K), np.uint8)
        inp_bits = np.zeros((self.inp_total, K), np.uint8)

        def extract(s, out):
            seg = self.segments[s]
            cc = seg.cc
            buf = np.asarray(
                self._bit_extractor(s)(out["onl2"], out["pre2"], jshifts, jcols)
            )
            nr, nc, ni = cc.n_recons2, cc.n_corrs2, cc.n_inputs2
            o = 0
            for n, dest, base in (
                (nr, rec_bits, seg.rec0),
                (nc, cor_bits, seg.cor0),
                (ni, inp_bits, seg.inp0),
            ):
                nb = n // 8 + 1
                packed = buf[o : o + nb * K].reshape(nb, K)
                o += nb * K
                dest[base : base + n] = np.unpackbits(packed, axis=0)[:n]

        with timer.phase("pass2"):
            self._run_segments(player_keys, wit2, rkp, mask, extract)

        # ---- assemble the proof (byte-identical to TpuKKW.prove) ----------
        with timer.phase("pack"):
            open2 = [
                (
                    _pack_bits_stream(rec_bits[:, j]),
                    _pack_bits_stream(cor_bits[:, j]),
                    _pack_bits_stream(inp_bits[:, j]),
                )
                for j in range(K)
            ]
        empty_np = np.asarray(empty)
        p2 = ProofSingle([], [])
        pz = ProofSingle([], [])
        j = 0
        for r in range(R):
            if omit[r] < 8:
                ks = player_keys[r].copy()
                ks[omit[r]] = 0
                rec, cor, inpt = open2[j]
                p2.online.append(OpenOnline(int(omit[r]), ks.tobytes(), rec, cor, inpt))
                pz.online.append(
                    OpenOnline(int(omit[r]), ks.tobytes(), b"", b"", b"")
                )
                j += 1
            else:
                p2.preprocessing.append(
                    OpenPreprocessing(seeds[r].tobytes(), ho2_np[r].tobytes())
                )
                pz.preprocessing.append(
                    OpenPreprocessing(seeds[r].tobytes(), empty_np[r].tobytes())
                )
        if profile:
            import sys as _sys

            print("streaming prove phase breakdown:\n" + timer.report(),
                  file=_sys.stderr)
        return Proof(comm, p2, pz)
