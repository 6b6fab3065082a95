"""CLI end-to-end (reference main.rs ops: prove/verify/oneshot/oneshot-zk)."""

import os
import subprocess
import sys

import pytest

from reverie_tpu.circuit import CombineOp, Gate, Op, dumps_program
from reverie_tpu.circuit.witness import format_witness_bits


@pytest.fixture()
def workdir(tmp_path):
    prog = [
        CombineOp.gf2(Gate(Op.INPUT, dst=0)),
        CombineOp.gf2(Gate(Op.INPUT, dst=1)),
        CombineOp.gf2(Gate(Op.MUL, dst=2, src1=0, src2=1)),
        CombineOp.gf2(Gate(Op.ADDC, dst=3, src1=2, const=1)),
        CombineOp.gf2(Gate(Op.ASSERT_ZERO, src1=3)),
    ]
    (tmp_path / "prog.bin").write_bytes(dumps_program(prog))
    (tmp_path / "wit.txt").write_bytes(format_witness_bits([True, True]))
    return tmp_path


def run_cli(*args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-m", "reverie_tpu.cli", *args],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


def test_cli_oneshot(workdir):
    r = run_cli(
        "--operation", "oneshot",
        "--program-path", str(workdir / "prog.bin"),
        "--witness-path", str(workdir / "wit.txt"),
        "--backend", "cpu",
    )
    assert r.returncode == 0, r.stderr


def test_cli_prove_verify_roundtrip(workdir):
    r = run_cli(
        "--operation", "prove",
        "--program-path", str(workdir / "prog.bin"),
        "--witness-path", str(workdir / "wit.txt"),
        "--proof-path", str(workdir / "proof.bin"),
        "--backend", "cpu",
    )
    assert r.returncode == 0, r.stderr
    assert (workdir / "proof.bin").exists()
    r = run_cli(
        "--operation", "verify",
        "--program-path", str(workdir / "prog.bin"),
        "--proof-path", str(workdir / "proof.bin"),
        "--backend", "cpu",
    )
    assert r.returncode == 0, r.stderr
    # corrupt the proof -> reject
    blob = bytearray((workdir / "proof.bin").read_bytes())
    blob[0] ^= 1
    (workdir / "proof.bin").write_bytes(bytes(blob))
    r = run_cli(
        "--operation", "verify",
        "--program-path", str(workdir / "prog.bin"),
        "--proof-path", str(workdir / "proof.bin"),
        "--backend", "cpu",
    )
    assert r.returncode != 0


def test_cli_streamed_prove_verify(workdir):
    """--segment-ops N streams the proof; bytes must match the unsegmented
    prover for fixed default seeds? (seeds are random) -- so round-trip +
    cross-verify with the unsegmented verifier instead."""
    r = run_cli(
        "--operation", "prove",
        "--program-path", str(workdir / "prog.bin"),
        "--witness-path", str(workdir / "wit.txt"),
        "--proof-path", str(workdir / "proof.bin"),
        "--backend", "cpu", "--segment-ops", "2",
    )
    assert r.returncode == 0, r.stderr
    # streamed verifier accepts
    r = run_cli(
        "--operation", "verify",
        "--program-path", str(workdir / "prog.bin"),
        "--proof-path", str(workdir / "proof.bin"),
        "--backend", "cpu", "--segment-ops", "2",
    )
    assert r.returncode == 0, r.stderr
    # the plain (unsegmented) verifier accepts the streamed proof too
    r = run_cli(
        "--operation", "verify",
        "--program-path", str(workdir / "prog.bin"),
        "--proof-path", str(workdir / "proof.bin"),
        "--backend", "cpu",
    )
    assert r.returncode == 0, r.stderr


def test_cli_version():
    r = run_cli("--operation", "version_info")
    assert r.returncode == 0
    assert "reverie_tpu_version" in r.stdout


def test_cli_bristol_prove_verify(tmp_path):
    """Bristol-fashion circuits prove/verify end-to-end via --format bristol
    with --bristol-output binding the public output value (without it the
    lowered program has no assertions -- a vacuous statement)."""
    # inputs a, b; output = a AND b (output wire must be the last wire)
    bristol = "1 3\n2 1 1\n1 1\n\n2 1 0 1 2 AND\n"
    (tmp_path / "c.txt").write_text(bristol)
    (tmp_path / "w.txt").write_bytes(b"11")
    r = run_cli(
        "--operation", "oneshot-zk",
        "--program-path", str(tmp_path / "c.txt"),
        "--witness-path", str(tmp_path / "w.txt"),
        "--format", "bristol", "--bristol-output", "1",
        "--backend", "cpu",
    )
    assert r.returncode == 0, r.stderr + r.stdout
    # wrong public output -> the prover aborts on the failed assert
    r = run_cli(
        "--operation", "oneshot-zk",
        "--program-path", str(tmp_path / "c.txt"),
        "--witness-path", str(tmp_path / "w.txt"),
        "--format", "bristol", "--bristol-output", "0",
        "--backend", "cpu",
    )
    assert r.returncode != 0
