"""Gate-semantics: masked-wire MPC values must equal cleartext evaluation
(the reference's debug-mode invariant, interpreter/mod.rs:16-20 and
single.rs:63-66), for every gate type and across all repetition groups."""

import numpy as np
import pytest

from reverie_tpu.algebra import gf2 as agf2
from reverie_tpu.algebra import z64 as az64
from reverie_tpu.backend import cpu
from reverie_tpu.circuit import CombineOp, Gate, Kind, Op, evaluate_composite_program, largest_wires
from reverie_tpu.crypto import expand_seeds
from reverie_tpu.params import KEY_SIZE


def run_prover(program, wit2, witz, G=4):
    rng = np.random.RandomState(1)
    seeds = rng.randint(0, 256, size=(G, 8, KEY_SIZE), dtype=np.uint8)
    m2, mz = cpu.count_masks(program)
    pk = expand_seeds(seeds.reshape(-1, KEY_SIZE)).reshape(G, 8, 8, KEY_SIZE)
    tape2, tapez = cpu.make_tapes(pk, None, m2, mz)
    t2 = cpu.Transcript("gf2", cpu.PROVER, G, tape2, witness=iter(wit2))
    tz = cpu.Transcript("z64", cpu.PROVER, G, tapez, witness=iter(witz))
    return cpu.execute(program, t2, tz, largest_wires(program))


def gf2_values(ins):
    """wire value = reconstruct(mask) + corr, as bits (W, G, 8reps)."""
    rec = agf2.reconstruct(ins.gf2.mask)
    val = agf2.recon_add(rec, ins.gf2.corr)
    return (agf2.rep_bytes(val) & 1).astype(np.uint8)


def z64_values(ins):
    return az64.recon_add(az64.reconstruct(ins.z64.mask), ins.z64.corr)


@pytest.mark.parametrize(
    "gate,wit,expect",
    [
        (Gate(Op.MUL, 2, 0, 1), [True, True], 1),
        (Gate(Op.MUL, 2, 0, 1), [True, False], 0),
        (Gate(Op.ADD, 2, 0, 1), [True, True], 0),
        (Gate(Op.ADD, 2, 0, 1), [True, False], 1),
        (Gate(Op.SUB, 2, 0, 1), [True, False], 1),
        (Gate(Op.ADDC, 2, 0, const=1), [True], 0),
        (Gate(Op.ADDC, 2, 0, const=0), [True], 1),
        (Gate(Op.SUBC, 2, 0, const=1), [False], 1),
        (Gate(Op.MULC, 2, 0, const=1), [True], 1),
        (Gate(Op.MULC, 2, 0, const=0), [True], 0),
        (Gate(Op.CONST, 2, const=1), [], 1),
    ],
)
def test_gf2_gate_semantics(gate, wit, expect):
    prog = [CombineOp.gf2(Gate(Op.INPUT, dst=i)) for i in range(len(wit))]
    prog.append(CombineOp.gf2(gate))
    ins = run_prover(prog, wit, [])
    vals = gf2_values(ins)
    assert np.all(vals[gate.dst] == expect)


@pytest.mark.parametrize(
    "gate,wit,expect",
    [
        (Gate(Op.MUL, 2, 0, 1), [400, 20], 8000),
        (Gate(Op.MUL, 2, 0, 1), [2**64 - 1, 20], (2**64 - 20) % 2**64),
        (Gate(Op.ADD, 2, 0, 1), [2**64 - 1, 21], 20),
        (Gate(Op.SUB, 2, 0, 1), [10, 20], 2**64 - 10),
        (Gate(Op.ADDC, 2, 0, const=20), [2**64 - 2], 18),
        (Gate(Op.SUBC, 2, 0, const=21), [20], 2**64 - 1),
        (Gate(Op.MULC, 2, 0, const=20), [2**63], 0),
        (Gate(Op.CONST, 2, const=123456789), [], 123456789),
    ],
)
def test_z64_gate_semantics(gate, wit, expect):
    prog = [CombineOp.z64(Gate(Op.INPUT, dst=i)) for i in range(len(wit))]
    prog.append(CombineOp.z64(gate))
    ins = run_prover(prog, [], wit)
    vals = z64_values(ins)
    assert np.all(vals[gate.dst] == np.uint64(expect))


def test_b2a_semantics():
    """B2A output equals the little-endian composition of the 64 input bits
    (combine.rs:132-219), checked against cleartext evaluation."""
    rng = np.random.RandomState(3)
    bits = [bool(b) for b in rng.randint(0, 2, size=64)]
    prog = [CombineOp.size_hint(2, 64)]
    prog += [CombineOp.gf2(Gate(Op.INPUT, dst=i)) for i in range(64)]
    prog += [CombineOp.b2a(1, 0)]
    ins = run_prover(prog, bits, [])
    z64_clear, _ = evaluate_composite_program(prog, bits, [])
    vals = z64_values(ins)
    assert np.all(vals[1] == z64_clear[1])


def test_random_circuit_matches_cleartext():
    from reverie_tpu.circuit.builders import wide_and_circuit

    prog, wit, witz = wide_and_circuit(80, width=24, seed=3)
    ins = run_prover(prog, wit, witz)
    z64_clear, gf2_clear = evaluate_composite_program(prog, wit, witz)
    vals = gf2_values(ins)
    for w in range(len(gf2_clear)):
        assert np.all(vals[w] == gf2_clear[w]), f"wire {w}"


# ---------------------------------------------------------------------------
# Runtime debug mode (REVERIE_DEBUG): per-gate cleartext equality asserts
# ---------------------------------------------------------------------------


def test_debug_mode_honest_prove(monkeypatch):
    """REVERIE_DEBUG=1 carries cleartext wires through the prover and checks
    every gate; an honest execution passes and produces the same proof."""
    from reverie_tpu.circuit.builders import mixed_b2a_circuit
    from reverie_tpu.proof import prove, verify

    prog, wit2, witz = mixed_b2a_circuit()
    seeds = np.random.RandomState(9).randint(0, 256, size=(32, 8, 16), dtype=np.uint8)
    plain = prove(prog, wit2, witz, seeds=seeds)
    monkeypatch.setenv("REVERIE_DEBUG", "1")
    checked = prove(prog, wit2, witz, seeds=seeds)
    assert checked.to_bytes() == plain.to_bytes()
    assert verify(checked, prog)


def test_debug_mode_detects_corrupted_state(monkeypatch):
    """Tampering with a wire's correction between gates trips the per-gate
    cleartext assert."""
    monkeypatch.setenv("REVERIE_DEBUG", "1")
    prog = [
        CombineOp.gf2(Gate(Op.INPUT, dst=0)),
        CombineOp.gf2(Gate(Op.INPUT, dst=1)),
    ]
    rng = np.random.RandomState(2)
    G = 2
    seeds = rng.randint(0, 256, size=(G, 8, KEY_SIZE), dtype=np.uint8)
    m2, mz = cpu.count_masks(prog + [CombineOp.gf2(Gate(Op.MUL, dst=2, src1=0, src2=1))])
    pk = expand_seeds(seeds.reshape(-1, KEY_SIZE)).reshape(G, 8, 8, KEY_SIZE)
    tape2, tapez = cpu.make_tapes(pk, None, m2, mz)
    t2 = cpu.Transcript("gf2", cpu.PROVER, G, tape2, witness=iter([True, True, True]))
    tz = cpu.Transcript("z64", cpu.PROVER, G, tapez, witness=iter([]))
    ins = cpu.CombineInstance(cpu.Instance("gf2", t2, 4), cpu.Instance("z64", tz, 1))
    for op in prog:
        ins.step(op)
    ins.gf2.corr[0] ^= np.uint64(0x0100)  # flip one rep's cleartext bit
    with pytest.raises(AssertionError, match="REVERIE_DEBUG"):
        ins.step(CombineOp.gf2(Gate(Op.MUL, dst=2, src1=0, src2=1)))


def test_debug_mode_verifier_honest(monkeypatch):
    """REVERIE_DEBUG=1 during verification runs the omitted-share-zero
    invariants (verifier/online.rs:141-160) without changing the outcome."""
    from reverie_tpu.circuit.builders import mixed_b2a_circuit
    from reverie_tpu.proof import prove, verify

    prog, wit2, witz = mixed_b2a_circuit()
    seeds = np.random.RandomState(5).randint(0, 256, size=(32, 8, 16), dtype=np.uint8)
    proof = prove(prog, wit2, witz, seeds=seeds)
    monkeypatch.setenv("REVERIE_DEBUG", "1")
    assert verify(proof, prog)


def test_debug_mode_verifier_detects_nonzero_omitted_lane(monkeypatch):
    """A regenerated tape with data in the omitted player's lane (the class
    of bug a tape-builder miscompile would produce) trips the verifier debug
    assert."""
    monkeypatch.setenv("REVERIE_DEBUG", "1")
    G = 1
    rng = np.random.RandomState(3)
    seeds = rng.randint(0, 256, size=(G, 8, KEY_SIZE), dtype=np.uint8)
    pk = expand_seeds(seeds.reshape(-1, KEY_SIZE)).reshape(G, 8, 8, KEY_SIZE)
    omit = np.array([[3, 0, 1, 2, 4, 5, 6, 7]], dtype=np.int64)
    tape2, _ = cpu.make_tapes(pk, omit, 4, 0)
    # simulate the bug: put a bit at rep 0's omitted player (player 3)
    tape2 = tape2.copy()
    tape2[0, 0] |= np.uint64(1) << np.uint64((7 - 0) * 8 + (7 - 3))
    t2 = cpu.Transcript("gf2", cpu.VERIFY_ONL, G, tape2)
    t2.set_debug_omit(omit)
    t2.r_recons = cpu._StreamReader(np.zeros((4, G), dtype=np.uint64), (G,))
    with pytest.raises(AssertionError, match="REVERIE_DEBUG"):
        t2.reconstruct(t2.new_mask())


def test_debug_mode_verifier_detects_misplaced_injection(monkeypatch):
    """An injected missing-share with bits outside the omitted player's
    positions trips the debug assert."""
    monkeypatch.setenv("REVERIE_DEBUG", "1")
    G = 1
    rng = np.random.RandomState(4)
    seeds = rng.randint(0, 256, size=(G, 8, KEY_SIZE), dtype=np.uint8)
    pk = expand_seeds(seeds.reshape(-1, KEY_SIZE)).reshape(G, 8, 8, KEY_SIZE)
    omit = np.array([[3, 0, 1, 2, 4, 5, 6, 7]], dtype=np.int64)
    tape2, _ = cpu.make_tapes(pk, omit, 4, 0)
    t2 = cpu.Transcript("gf2", cpu.VERIFY_ONL, G, tape2)
    t2.set_debug_omit(omit)
    # corrupt the injected stream: a bit at rep 0, player 5 (omit is 3)
    bad = np.zeros((4, G), dtype=np.uint64)
    bad[0, 0] = np.uint64(1) << np.uint64((7 - 0) * 8 + (7 - 5))
    t2.r_recons = cpu._StreamReader(bad, (G,))
    with pytest.raises(AssertionError, match="REVERIE_DEBUG"):
        t2.reconstruct(t2.new_mask())
