"""End-to-end prove -> verify round-trips on the CPU golden backend
(modeled on reference proof/mod.rs:397-427 test_prover_gf2_mul)."""

import numpy as np
import pytest

from reverie_tpu.circuit import CombineOp, Gate, Op
from reverie_tpu.circuit.builders import mixed_b2a_circuit, mul_bench_circuit, wide_and_circuit
from reverie_tpu.proof import Proof, prove, verify


def fixed_seeds():
    rng = np.random.RandomState(42)
    return rng.randint(0, 256, size=(32, 8, 16), dtype=np.uint8)


def test_roundtrip_gf2_mul():
    prog, wit2, witz = mul_bench_circuit(20)
    proof = prove(prog, wit2, witz, seeds=fixed_seeds())
    assert verify(proof, prog)


def test_roundtrip_wide_and():
    prog, wit2, witz = wide_and_circuit(80, width=32, seed=7)
    proof = prove(prog, wit2, witz, seeds=fixed_seeds())
    assert verify(proof, prog)


def test_roundtrip_z64():
    prog = [
        CombineOp.z64(Gate(Op.INPUT, dst=0)),
        CombineOp.z64(Gate(Op.INPUT, dst=1)),
        CombineOp.z64(Gate(Op.MUL, dst=2, src1=0, src2=1)),
        CombineOp.z64(Gate(Op.SUBC, dst=3, src1=2, const=15)),
        CombineOp.z64(Gate(Op.ASSERT_ZERO, src1=3)),
    ]
    proof = prove(prog, [], [3, 5], seeds=fixed_seeds())
    assert verify(proof, prog)


def test_roundtrip_mixed_b2a():
    prog, wit2, witz = mixed_b2a_circuit()
    proof = prove(prog, wit2, witz, seeds=fixed_seeds())
    assert verify(proof, prog)


def test_proof_serialization_roundtrip():
    prog, wit2, witz = mul_bench_circuit(5)
    proof = prove(prog, wit2, witz, seeds=fixed_seeds())
    blob = proof.to_bytes()
    back = Proof.from_bytes(blob)
    assert back == proof
    assert verify(back, prog)


def test_tampered_proof_rejected():
    prog, wit2, witz = mul_bench_circuit(5)
    proof = prove(prog, wit2, witz, seeds=fixed_seeds())
    blob = bytearray(proof.to_bytes())
    blob[5] ^= 1  # flip a bit in the commitment
    assert not verify(Proof.from_bytes(bytes(blob)), prog)
    # flip a bit in an opening stream instead
    blob = bytearray(proof.to_bytes())
    blob[-1] ^= 1
    assert not verify(Proof.from_bytes(bytes(blob)), prog)


def test_invalid_witness_aborts():
    prog = [
        CombineOp.gf2(Gate(Op.INPUT, dst=0)),
        CombineOp.gf2(Gate(Op.ASSERT_ZERO, src1=0)),
    ]
    with pytest.raises(AssertionError):
        prove(prog, [True], [], seeds=fixed_seeds())


def test_deterministic_with_seeds():
    prog, wit2, witz = mul_bench_circuit(5)
    p1 = prove(prog, wit2, witz, seeds=fixed_seeds())
    p2 = prove(prog, wit2, witz, seeds=fixed_seeds())
    assert p1.to_bytes() == p2.to_bytes()


def test_nondefault_params_roundtrip():
    """online_reps/total_reps are runtime config (the reference hard-codes
    lib.rs:29-33); a smaller instance must round-trip on both backends and a
    default-params verifier must reject its proofs."""
    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.params import ProtocolParams

    params = ProtocolParams(online_reps=16, total_reps=64)
    prog, wit2, witz = mul_bench_circuit(20)
    seeds = np.random.RandomState(3).randint(
        0, 256, size=(8, 8, 16), dtype=np.uint8
    )
    proof = prove(prog, wit2, witz, seeds=seeds, params=params)
    assert verify(proof, prog, params=params)

    sys_ = TpuKKW(prog, params=params)
    tproof = sys_.prove(wit2, witz, seeds=seeds.reshape(64, 16))
    assert tproof.to_bytes() == proof.to_bytes()
    assert sys_.verify(tproof)

    # a verifier configured for the reference parameters must reject
    assert not verify(proof, prog)


def test_nondefault_params_deep_scan_circuit():
    """Non-default repetition counts through the lax.scan executor (deep
    circuit): the scan trace config carries R, so smaller instances share
    none of the default-R compiles but stay byte-identical to the golden
    backend."""
    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.backend.tpu_scan import ScanExecutor
    from reverie_tpu.circuit.builders import wide_and_circuit
    from reverie_tpu.params import ProtocolParams

    params = ProtocolParams(online_reps=16, total_reps=64)
    prog, wit2, witz = wide_and_circuit(400, width=4, seed=2)
    seeds = np.random.RandomState(4).randint(0, 256, size=(8, 8, 16), dtype=np.uint8)
    proof = prove(prog, wit2, witz, seeds=seeds, params=params)
    sys_ = TpuKKW(prog, params=params)
    assert isinstance(sys_._executor(0, 64), ScanExecutor)
    tproof = sys_.prove(wit2, witz, seeds=seeds.reshape(64, 16))
    assert tproof.to_bytes() == proof.to_bytes()
    assert sys_.verify(tproof)


def test_make_system_auto_streaming():
    """reverie_tpu.make_system returns the in-HBM prover for small circuits
    and a streaming prover (segment size fitted to the budget) for circuits
    whose footprint exceeds it; both byte-identical."""
    from reverie_tpu import make_system
    from reverie_tpu.backend.streaming import StreamingKKW
    from reverie_tpu.backend.tpu_host import TpuKKW
    from reverie_tpu.circuit.builders import mul_bench_circuit

    prog, wit2, witz = mul_bench_circuit(20)
    s = np.random.RandomState(7).randint(0, 256, size=(256, 16), dtype=np.uint8)
    small = make_system(prog)
    assert isinstance(small, TpuKKW)
    base = small.prove(wit2, witz, seeds=s)
    # tiny budget forces streaming
    big = make_system(prog, hbm_budget_bytes=20_000)
    assert isinstance(big, StreamingKKW)
    assert len(big.segments) > 1
    proof = big.prove(wit2, witz, seeds=s)
    assert proof.to_bytes() == base.to_bytes()
    assert big.verify(proof)
