"""Proof orchestration: prove + verify (reference src/proof/mod.rs:118-308).

This module drives a backend (CPU golden backend today, TPU backend via the
same interfaces) through the KKW flow:

  prove:   execute all 32 packed groups -> 256 rep hashes -> comm ->
           challenge -> per-rep openings -> Proof
  verify:  regroup openings (any 8 online reps form a packed batch,
           proof/mod.rs:234-246) -> re-execute -> reorder hashes -> comm check
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from ..algebra import gf2 as agf2
from ..algebra import z64 as az64
from ..backend import cpu
from ..circuit.ir import CombineOp, largest_wires
from ..crypto import blake3, expand_seeds
from ..params import DEFAULT_PARAMS, KEY_SIZE, ProtocolParams
from .challenge import challenge_to_opening, opening_to_packed
from .container import OpenOnline, OpenPreprocessing, Proof, ProofSingle

U64 = np.uint64


def prove(
    program: Sequence[CombineOp],
    wit_gf2: Sequence[bool],
    wit_z64: Sequence[int],
    wire_counts: Optional[tuple] = None,
    seeds: Optional[np.ndarray] = None,
    params: ProtocolParams = DEFAULT_PARAMS,
) -> Proof:
    """Create a proof.  `seeds` (packed_reps, 8, 16) uint8 makes the proof
    deterministic (the reference draws them from OsRng, proof/mod.rs:131-134;
    injectable here for golden tests)."""
    if wire_counts is None:
        wire_counts = largest_wires(program)
    G = params.packed_reps
    if seeds is None:
        seeds = np.frombuffer(os.urandom(G * 8 * KEY_SIZE), dtype=np.uint8).reshape(G, 8, 16)
    seeds = np.ascontiguousarray(seeds, dtype=np.uint8)
    assert seeds.shape == (G, 8, KEY_SIZE)

    m2, mz = cpu.count_masks(program)
    player_keys = expand_seeds(seeds.reshape(-1, KEY_SIZE)).reshape(G, 8, 8, KEY_SIZE)
    tape2, tapez = cpu.make_tapes(player_keys, None, m2, mz)

    t2 = cpu.Transcript("gf2", cpu.PROVER, G, tape2, witness=iter(wit_gf2))
    tz = cpu.Transcript("z64", cpu.PROVER, G, tapez, witness=iter(wit_z64))
    ins = cpu.execute(program, t2, tz, wire_counts)

    rep_hashes = ins.rep_hash().reshape(G * 8, 32)  # group-major rep order
    comm = blake3(rep_hashes.tobytes())

    open_map = challenge_to_opening(comm, params)
    packed = np.array(opening_to_packed(open_map, params), dtype=np.int64)  # (G, 8)
    selected = packed < params.players

    # pack recorded transcript streams (prover extract, prover.rs:57-175)
    def stack(lst, shape_tail):
        if lst:
            return np.stack(lst)
        return np.zeros((0, G) + shape_tail, dtype=U64)

    recons2 = agf2.pack_selected_shares(stack(t2.recons, ()), packed, selected)
    corrs2 = agf2.pack_recon(stack(t2.corrs, ()), selected)
    inputs2 = agf2.pack_recon(stack(t2.inputs, ()), selected)
    reconsz = az64.pack_selected_shares(stack(tz.recons, (8, 8)), packed, selected)
    corrsz = az64.pack_recon(stack(tz.corrs, (8,)), selected)
    inputsz = az64.pack_recon(stack(tz.inputs, (8,)), selected)

    onl2_hash = t2.online_hash()  # (G, 8, 32)
    onlz_hash = tz.online_hash()

    p2 = ProofSingle([], [])
    pz = ProofSingle([], [])
    for g in range(G):
        for r in range(8):
            omit = int(packed[g, r])
            if omit < params.players:
                ks = player_keys[g, r].copy()
                ks[omit] = 0
                p2.online.append(
                    OpenOnline(omit, ks.tobytes(), recons2[(g, r)], corrs2[(g, r)], inputs2[(g, r)])
                )
                pz.online.append(
                    OpenOnline(omit, ks.tobytes(), reconsz[(g, r)], corrsz[(g, r)], inputsz[(g, r)])
                )
            else:
                p2.preprocessing.append(
                    OpenPreprocessing(seeds[g, r].tobytes(), onl2_hash[g, r].tobytes())
                )
                pz.preprocessing.append(
                    OpenPreprocessing(seeds[g, r].tobytes(), onlz_hash[g, r].tobytes())
                )

    return Proof(comm, p2, pz)


def verify(
    proof: Proof,
    program: Sequence[CombineOp],
    wire_counts: Optional[tuple] = None,
    params: ProtocolParams = DEFAULT_PARAMS,
    strict_zero_check: bool = True,
) -> bool:
    """Verify a proof.  `strict_zero_check` additionally requires all
    AssertZero reconstructions in the opened online executions to be zero --
    the reference computes but never consults this flag (verifier/online.rs:21
    vs proof/mod.rs:224-307; SURVEY.md section 5 caveat 1).  Honest proofs
    always pass either way."""
    if wire_counts is None:
        wire_counts = largest_wires(program)
    if not proof.gf2.check_format(params.online_reps, params.preprocessing_reps):
        return False
    if not proof.z64.check_format(params.online_reps, params.preprocessing_reps):
        return False
    m2, mz = cpu.count_masks(program)

    # ---- online repetitions, regrouped in chunks of 8 ---------------------
    n_onl_groups = params.online_reps // params.packed
    hashes_online = []
    zero_ok = True
    for g in range(n_onl_groups):
        o2 = proof.gf2.online[g * 8 : (g + 1) * 8]
        oz = proof.z64.online[g * 8 : (g + 1) * 8]
        try:
            h, ok = _run_online_group(o2, oz, program, wire_counts, m2, mz)
        except (AssertionError, ValueError):
            # structurally malformed openings (e.g. unequal stream lengths in
            # a packed group): the reference panics here
            # (gf2/share.rs:157-164 assert_eq); a bool API rejects cleanly
            return False
        zero_ok &= ok
        hashes_online.append(h)
    hashes_online = (
        np.concatenate(hashes_online, axis=0) if hashes_online else np.zeros((0, 32), np.uint8)
    )

    # ---- preprocessing repetitions ----------------------------------------
    n_pre_groups = params.preprocessing_reps // params.packed
    G = n_pre_groups
    seeds = np.zeros((G, 8, KEY_SIZE), dtype=np.uint8)
    comm2 = np.zeros((G, 8, 32), dtype=np.uint8)
    commz = np.zeros((G, 8, 32), dtype=np.uint8)
    for g in range(G):
        for r in range(8):
            p2 = proof.gf2.preprocessing[g * 8 + r]
            pz = proof.z64.preprocessing[g * 8 + r]
            seeds[g, r] = np.frombuffer(p2.seed, dtype=np.uint8)
            if pz.seed != p2.seed:
                # the reference expands each domain's seed independently; they
                # are equal for honestly-generated proofs, but re-derive both
                pass
            comm2[g, r] = np.frombuffer(p2.comm_online, dtype=np.uint8)
            commz[g, r] = np.frombuffer(pz.comm_online, dtype=np.uint8)

    player_keys = expand_seeds(seeds.reshape(-1, KEY_SIZE)).reshape(G, 8, 8, KEY_SIZE)
    # the z64 transcript uses the z64 opening's seed (may differ if malformed)
    seedsz = np.stack(
        [
            np.frombuffer(proof.z64.preprocessing[i].seed, dtype=np.uint8)
            for i in range(G * 8)
        ]
    ).reshape(G, 8, KEY_SIZE)
    player_keysz = expand_seeds(seedsz.reshape(-1, KEY_SIZE)).reshape(G, 8, 8, KEY_SIZE)

    tape2, _ = cpu.make_tapes(player_keys, None, m2, 0)
    _, tapez = cpu.make_tapes(player_keysz, None, 0, mz)
    t2 = cpu.Transcript("gf2", cpu.VERIFY_PRE, G, tape2)
    tz = cpu.Transcript("z64", cpu.VERIFY_PRE, G, tapez)
    t2.comm_online = comm2
    tz.comm_online = commz
    ins = cpu.execute(program, t2, tz, wire_counts)
    hashes_pre = ins.rep_hash().reshape(G * 8, 32)

    # ---- reorder into challenge order and recompute comm ------------------
    open_map = challenge_to_opening(proof.comm, params)
    ordered = np.zeros((params.total_reps, 32), dtype=np.uint8)
    io_ = ip = 0
    for i in range(params.total_reps):
        if i in open_map:
            ordered[i] = hashes_online[io_]
            io_ += 1
        else:
            ordered[i] = hashes_pre[ip]
            ip += 1
    comm = blake3(ordered.tobytes())
    if comm != proof.comm:
        return False
    if strict_zero_check and not zero_ok:
        return False
    return True


def _run_online_group(o2, oz, program, wire_counts, m2, mz):
    """Re-execute one packed batch of 8 online repetitions (G=1 group)."""
    omit2 = [o.omit for o in o2]
    player_keys = np.stack(
        [np.frombuffer(o.seeds, dtype=np.uint8).reshape(8, KEY_SIZE) for o in o2]
    )[None]  # (1, 8, 8, 16)
    player_keysz = np.stack(
        [np.frombuffer(o.seeds, dtype=np.uint8).reshape(8, KEY_SIZE) for o in oz]
    )[None]
    omit_arr = np.array([omit2], dtype=np.int64)  # (1, 8)
    omitz_arr = np.array([[o.omit for o in oz]], dtype=np.int64)

    tape2, _ = cpu.make_tapes(player_keys, omit_arr, m2, 0)
    _, tapez = cpu.make_tapes(player_keysz, omitz_arr, 0, mz)

    t2 = cpu.Transcript("gf2", cpu.VERIFY_ONL, 1, tape2)
    tz = cpu.Transcript("z64", cpu.VERIFY_ONL, 1, tapez)
    t2.set_debug_omit(omit_arr)  # REVERIE_DEBUG invariants (no-op otherwise)
    tz.set_debug_omit(omitz_arr)

    t2.r_corrs = cpu._StreamReader(
        agf2.unpack_recon([o.corrs for o in o2])[:, None], (1,)
    )
    t2.r_inputs = cpu._StreamReader(
        agf2.unpack_recon([o.inputs for o in o2])[:, None], (1,)
    )
    t2.r_recons = cpu._StreamReader(
        agf2.unpack_selected_shares([o.recons for o in o2], omit2)[:, None], (1,)
    )
    tz.r_corrs = cpu._StreamReader(
        az64.unpack_recon([o.corrs for o in oz])[:, None, :], (1, 8)
    )
    tz.r_inputs = cpu._StreamReader(
        az64.unpack_recon([o.inputs for o in oz])[:, None, :], (1, 8)
    )
    tz.r_recons = cpu._StreamReader(
        az64.unpack_selected_shares([o.recons for o in oz], [o.omit for o in oz])[:, None],
        (1, 8, 8),
    )

    ins = cpu.execute(program, t2, tz, wire_counts)
    h = ins.rep_hash().reshape(8, 32)
    ok = not any(bool(np.any(f)) for f in t2.zero_failures + tz.zero_failures)
    return h, ok
