"""Committed golden proof vectors: guard the proof byte format across
refactors (cross-implementation format stability; SURVEY.md section 4)."""

import os

import numpy as np

from reverie_tpu.circuit import load_program
from reverie_tpu.circuit.builders import mixed_b2a_circuit
from reverie_tpu.proof import Proof, prove, verify

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _load():
    prog = load_program(open(os.path.join(GOLDEN, "b2a_program.bin"), "rb").read())
    seeds = np.frombuffer(
        open(os.path.join(GOLDEN, "b2a_seeds.bin"), "rb").read(), dtype=np.uint8
    ).reshape(32, 8, 16)
    blob = open(os.path.join(GOLDEN, "b2a_proof.bin"), "rb").read()
    return prog, seeds, blob


def test_golden_program_matches_builder():
    prog, _, _ = _load()
    assert prog == mixed_b2a_circuit()[0]


def test_golden_proof_reproduced_cpu():
    prog, seeds, blob = _load()
    _, wit2, witz = mixed_b2a_circuit()
    proof = prove(prog, wit2, witz, seeds=seeds)
    assert proof.to_bytes() == blob


def test_golden_proof_reproduced_tpu_backend():
    from reverie_tpu.backend.tpu_host import TpuKKW

    prog, seeds, blob = _load()
    _, wit2, witz = mixed_b2a_circuit()
    proof = TpuKKW(prog).prove(wit2, witz, seeds=seeds.reshape(256, 16))
    assert proof.to_bytes() == blob


def test_golden_proof_verifies():
    prog, _, blob = _load()
    assert verify(Proof.from_bytes(blob), prog)
