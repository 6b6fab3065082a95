"""Circuit intermediate representation.

The reference consumes its circuit IR from the external `mcircuit` crate
(reference Cargo.toml:35, re-exported at src/lib.rs:6-7); this module is our
first-class replacement.  A program is a list of `CombineOp`s, each either a
single-domain gate (GF2 over bits, Z64 over the 2^64 ring), a bool->arith
conversion (`B2A`), or a wire-arena `SizeHint`
(reference src/interpreter/combine.rs:120-220 for consumed variants).

Two representations:

  * a friendly object form (`Gate`, `CombineOp`) for construction and tests;
  * a dense NumPy table (`ProgramTable`) used by the compiler / executors --
    columns (kind, opcode, dst, src1, src2, const64).

Opcode numbering follows the `mcircuit::Operation` enum declaration order so
that bincode program files (enum tag = variant index, u32 LE) round-trip.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Iterable, Iterator, List, Sequence, Tuple, Union

import numpy as np


class Op(enum.IntEnum):
    """Single-domain gate opcodes (mcircuit `Operation<T>` variant order)."""

    INPUT = 0  # Input(dst)
    RANDOM = 1  # Random(dst)
    ADD = 2  # Add(dst, a, b)
    ADDC = 3  # AddConst(dst, src, c)
    SUB = 4  # Sub(dst, a, b)
    SUBC = 5  # SubConst(dst, src, c)
    MUL = 6  # Mul(dst, a, b)
    MULC = 7  # MulConst(dst, src, c)
    ASSERT_ZERO = 8  # AssertZero(src)
    CONST = 9  # Const(dst, c)


class Kind(enum.IntEnum):
    """`CombineOperation` variant order (mcircuit)."""

    GF2 = 0  # GF2(Operation<bool>)
    Z64 = 1  # Z64(Operation<u64>)
    B2A = 2  # B2A(dst_z64, src_gf2)
    SIZE_HINT = 3  # SizeHint(z64_cells, gf2_cells)


# Opcodes that read a constant operand.
CONST_OPS = frozenset({Op.ADDC, Op.SUBC, Op.MULC, Op.CONST})
# Opcodes with two wire sources.
TWO_SRC_OPS = frozenset({Op.ADD, Op.SUB, Op.MUL})
# Opcodes with one wire source (plus maybe a const).
ONE_SRC_OPS = frozenset({Op.ADDC, Op.SUBC, Op.MULC})


@dataclasses.dataclass(frozen=True)
class Gate:
    """A single-domain gate."""

    op: Op
    dst: int = 0
    src1: int = 0
    src2: int = 0
    const: int = 0  # for GF2 gates: 0/1; for Z64: u64

    def dst_wire(self):
        if self.op == Op.ASSERT_ZERO:
            return None
        return self.dst


@dataclasses.dataclass(frozen=True)
class CombineOp:
    """A composite-circuit instruction."""

    kind: Kind
    gate: Union[Gate, None] = None  # for GF2/Z64 kinds
    a: int = 0  # B2A dst_z64 / SizeHint z64_cells
    b: int = 0  # B2A src_gf2 / SizeHint gf2_cells

    # ---- constructors -------------------------------------------------
    @staticmethod
    def gf2(gate: Gate) -> "CombineOp":
        return CombineOp(Kind.GF2, gate=gate)

    @staticmethod
    def z64(gate: Gate) -> "CombineOp":
        return CombineOp(Kind.Z64, gate=gate)

    @staticmethod
    def b2a(dst_z64: int, src_gf2: int) -> "CombineOp":
        return CombineOp(Kind.B2A, a=dst_z64, b=src_gf2)

    @staticmethod
    def size_hint(z64_cells: int, gf2_cells: int) -> "CombineOp":
        return CombineOp(Kind.SIZE_HINT, a=z64_cells, b=gf2_cells)


Program = List[CombineOp]

# ---------------------------------------------------------------------------
# Dense table form
# ---------------------------------------------------------------------------

TABLE_DTYPE = np.dtype(
    [
        ("kind", np.uint8),
        ("opcode", np.uint8),
        ("dst", np.uint32),
        ("src1", np.uint32),
        ("src2", np.uint32),
        ("const", np.uint64),
    ]
)


class ProgramTable:
    """Dense row-per-instruction program representation."""

    def __init__(self, rows: np.ndarray):
        assert rows.dtype == TABLE_DTYPE
        self.rows = rows

    def __len__(self) -> int:
        return len(self.rows)

    @staticmethod
    def from_ops(ops: Iterable[CombineOp]) -> "ProgramTable":
        ops = list(ops)
        rows = np.zeros(len(ops), dtype=TABLE_DTYPE)
        for i, op in enumerate(ops):
            r = rows[i]
            r["kind"] = int(op.kind)
            if op.kind in (Kind.GF2, Kind.Z64):
                g = op.gate
                r["opcode"] = int(g.op)
                r["dst"] = g.dst
                r["src1"] = g.src1
                r["src2"] = g.src2
                r["const"] = np.uint64(g.const)
            else:
                r["dst"] = op.a
                r["src1"] = op.b
        return ProgramTable(rows)

    def to_ops(self) -> Program:
        out: Program = []
        for r in self.rows:
            kind = Kind(int(r["kind"]))
            if kind in (Kind.GF2, Kind.Z64):
                g = Gate(
                    Op(int(r["opcode"])),
                    int(r["dst"]),
                    int(r["src1"]),
                    int(r["src2"]),
                    int(r["const"]),
                )
                out.append(CombineOp(kind, gate=g))
            elif kind == Kind.B2A:
                out.append(CombineOp.b2a(int(r["dst"]), int(r["src1"])))
            else:
                out.append(CombineOp.size_hint(int(r["dst"]), int(r["src1"])))
        return out


# ---------------------------------------------------------------------------
# Wire counting (mcircuit `largest_wires`, used at reference main.rs:73,107)
# ---------------------------------------------------------------------------


def largest_wires(program: Sequence[CombineOp]) -> Tuple[int, int]:
    """Return (z64_wire_count, gf2_wire_count): 1 + the largest wire index
    touched in each domain, also honouring SizeHint rows."""
    z64_hi = 0
    gf2_hi = 0
    for op in program:
        if op.kind == Kind.GF2:
            g = op.gate
            hi = _gate_max_wire(g)
            gf2_hi = max(gf2_hi, hi + 1)
        elif op.kind == Kind.Z64:
            g = op.gate
            hi = _gate_max_wire(g)
            z64_hi = max(z64_hi, hi + 1)
        elif op.kind == Kind.B2A:
            z64_hi = max(z64_hi, op.a + 1)
            gf2_hi = max(gf2_hi, op.b + 64)
        elif op.kind == Kind.SIZE_HINT:
            z64_hi = max(z64_hi, op.a)
            gf2_hi = max(gf2_hi, op.b)
    return z64_hi, gf2_hi


def _gate_max_wire(g: Gate) -> int:
    # Convention: AssertZero(src) stores its single operand in `src1`.
    if g.op == Op.ASSERT_ZERO:
        return g.src1
    hi = g.dst
    if g.op in TWO_SRC_OPS:
        hi = max(hi, g.src1, g.src2)
    elif g.op in ONE_SRC_OPS:
        hi = max(hi, g.src1)
    return hi


def iter_gates(program: Sequence[CombineOp]) -> Iterator[CombineOp]:
    return iter(program)
