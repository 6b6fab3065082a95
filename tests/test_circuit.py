"""Circuit IR, bincode round-trip, Bristol parsing, cleartext evaluation,
witness parsing (reference: mcircuit consumption per SURVEY.md section 0,
src/main.rs, src/witness.rs)."""

import io

import numpy as np

from reverie_tpu.circuit import (
    CombineOp,
    Gate,
    Kind,
    Op,
    ProgramTable,
    bristol_to_program,
    bristol_with_output_assertion,
    dumps_program,
    evaluate_composite_program,
    largest_wires,
    load_program,
    parse_bristol,
    parse_witness_bits,
)


def sample_program():
    return [
        CombineOp.size_hint(4, 8),
        CombineOp.gf2(Gate(Op.INPUT, dst=0)),
        CombineOp.gf2(Gate(Op.INPUT, dst=1)),
        CombineOp.gf2(Gate(Op.MUL, dst=2, src1=0, src2=1)),
        CombineOp.gf2(Gate(Op.ADDC, dst=3, src1=2, const=1)),
        CombineOp.z64(Gate(Op.INPUT, dst=0)),
        CombineOp.z64(Gate(Op.MULC, dst=1, src1=0, const=3)),
        CombineOp.z64(Gate(Op.SUBC, dst=2, src1=1, const=21)),
        CombineOp.z64(Gate(Op.ASSERT_ZERO, src1=2)),
        CombineOp.gf2(Gate(Op.CONST, dst=4, const=1)),
    ]


def test_bincode_roundtrip():
    prog = sample_program()
    blob = dumps_program(prog)
    back = load_program(blob)
    assert back == prog


def test_table_roundtrip():
    prog = sample_program()
    table = ProgramTable.from_ops(prog)
    assert table.to_ops() == prog


def test_largest_wires():
    z64, gf2 = largest_wires(sample_program())
    assert gf2 == 8  # size hint dominates
    assert z64 == 4
    z64, gf2 = largest_wires([CombineOp.b2a(5, 10)])
    assert z64 == 6
    assert gf2 == 74  # b2a reads 64 gf2 wires starting at 10


def test_cleartext_eval():
    prog = sample_program()
    z64, gf2 = evaluate_composite_program(prog, [True, True], [7])
    assert gf2[2] == 1  # 1*1
    assert gf2[3] == 0  # 1^1
    assert gf2[4] == 1
    assert z64[1] == 21
    assert z64[2] == 0


def test_cleartext_eval_b2a():
    prog = [
        CombineOp.size_hint(1, 64),
    ]
    prog += [CombineOp.gf2(Gate(Op.INPUT, dst=i)) for i in range(64)]
    prog += [CombineOp.b2a(0, 0)]
    bits = [False] * 64
    bits[0] = True  # LSB
    bits[5] = True
    z64, _ = evaluate_composite_program(prog, bits, [])
    assert z64[0] == 1 + 32


def test_cleartext_assert_fail():
    prog = [
        CombineOp.gf2(Gate(Op.INPUT, dst=0)),
        CombineOp.gf2(Gate(Op.ASSERT_ZERO, src1=0)),
    ]
    import pytest

    with pytest.raises(AssertionError):
        evaluate_composite_program(prog, [True], [])


BRISTOL_XOR_AND = """\
3 7
2 2 2
1 1

2 1 0 2 4 XOR
2 1 1 3 5 AND
2 1 4 5 6 AND
"""


def test_bristol_parse_and_eval():
    circ = parse_bristol(BRISTOL_XOR_AND)
    assert circ.ngates == 3
    assert circ.n_input_bits == 4
    assert circ.output_wires() == [6]
    prog = bristol_to_program(circ)
    # inputs a0,a1,b0,b1; out = (a0^b0) & (a1&b1)
    z64, gf2 = evaluate_composite_program(prog, [True, True, False, True], [])
    assert gf2[6] == ((1 ^ 0) & (1 & 1))


def test_bristol_output_assertion():
    circ = parse_bristol(BRISTOL_XOR_AND)
    prog = bristol_with_output_assertion(circ, [1])
    evaluate_composite_program(prog, [True, True, False, True], [])  # should pass
    import pytest

    with pytest.raises(AssertionError):
        prog_bad = bristol_with_output_assertion(circ, [0])
        evaluate_composite_program(prog_bad, [True, True, False, True], [])


def test_witness_parse():
    assert parse_witness_bits(b"0 1\n1x0") == [False, True, True, False]


def test_program_bincode_golden_bytes():
    """Byte-level pin of the program wire format (docs/MCIRCUIT_PROVENANCE.md):
    enum tags are u32 LE declaration indices, usize is u64 LE, gf2 consts one
    byte, z64 consts u64 LE.  Hand-computed, independent of the codec."""
    import struct

    from reverie_tpu.circuit import CombineOp, Gate, Op, dumps_program, load_program

    prog = [
        CombineOp.size_hint(7, 9),
        CombineOp.gf2(Gate(Op.INPUT, dst=3)),
        CombineOp.gf2(Gate(Op.ADDC, dst=4, src1=3, const=1)),
        CombineOp.z64(Gate(Op.MUL, dst=2, src1=0, src2=1)),
        CombineOp.z64(Gate(Op.SUBC, dst=5, src1=2, const=0xDEADBEEF)),
        CombineOp.b2a(6, 10),
        CombineOp.gf2(Gate(Op.ASSERT_ZERO, src1=4)),
    ]
    expect = b"".join(
        [
            struct.pack("<Q", 7),  # Vec length
            struct.pack("<I", 3), struct.pack("<QQ", 7, 9),  # SizeHint(7, 9)
            struct.pack("<I", 0), struct.pack("<I", 0), struct.pack("<Q", 3),  # GF2(Input(3))
            struct.pack("<I", 0), struct.pack("<I", 3), struct.pack("<QQ", 4, 3), b"\x01",  # GF2(AddConst)
            struct.pack("<I", 1), struct.pack("<I", 6), struct.pack("<QQQ", 2, 0, 1),  # Z64(Mul)
            struct.pack("<I", 1), struct.pack("<I", 5), struct.pack("<QQ", 5, 2), struct.pack("<Q", 0xDEADBEEF),  # Z64(SubConst)
            struct.pack("<I", 2), struct.pack("<QQ", 6, 10),  # B2A(6, 10)
            struct.pack("<I", 0), struct.pack("<I", 8), struct.pack("<Q", 4),  # GF2(AssertZero(4))
        ]
    )
    got = dumps_program(prog)
    assert got == expect
    assert load_program(expect) == prog
