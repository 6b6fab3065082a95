"""SHA-256 circuit generation (benchmark config 2) validated vs hashlib."""

import hashlib

import pytest

from reverie_tpu.circuit import evaluate_composite_program
from reverie_tpu.circuit.sha256 import (
    block_to_witness_bits,
    count_and_gates,
    sha256_pad_one_block,
    sha256_preimage_statement,
)


def test_sha256_circuit_valid_preimage():
    msg = b"The quick brown fox jumps over the lazy dog"
    digest = hashlib.sha256(msg).digest()
    prog, n_in = sha256_preimage_statement(digest)
    assert n_in == 512
    wit = block_to_witness_bits(sha256_pad_one_block(msg))
    evaluate_composite_program(prog, wit, [])  # must not raise


def test_sha256_circuit_rejects_wrong_preimage():
    digest = hashlib.sha256(b"message A").digest()
    prog, _ = sha256_preimage_statement(digest)
    wit = block_to_witness_bits(sha256_pad_one_block(b"message B"))
    with pytest.raises(AssertionError):
        evaluate_composite_program(prog, wit, [])


def test_sha256_and_count():
    prog, _ = sha256_preimage_statement(b"\x00" * 32)
    n_and = count_and_gates(prog)
    # canonical SHA-256 boolean circuits are ~22-25k AND gates
    assert 20_000 <= n_and <= 26_000, n_and


def test_sha256_empty_message():
    digest = hashlib.sha256(b"").digest()
    prog, _ = sha256_preimage_statement(digest)
    wit = block_to_witness_bits(sha256_pad_one_block(b""))
    evaluate_composite_program(prog, wit, [])


def test_sha256_long_message_statement():
    """Multi-block Merkle-Damgard chaining validated vs hashlib: 100-byte
    message = 2 compression blocks."""
    from reverie_tpu.circuit.sha256 import (
        sha256_long_preimage_statement,
        sha256_pad_message,
    )

    msg = bytes(range(100))
    padded = sha256_pad_message(msg)
    assert len(padded) == 128
    digest = hashlib.sha256(msg).digest()
    prog, n_in = sha256_long_preimage_statement(digest, 2)
    assert n_in == 1024
    wit = []
    for i in range(0, len(padded), 64):
        wit.extend(block_to_witness_bits(padded[i : i + 64]))
    evaluate_composite_program(prog, wit, [])  # must not raise
    # wrong preimage rejects
    bad = list(wit)
    bad[3] = not bad[3]
    with pytest.raises(AssertionError):
        evaluate_composite_program(prog, bad, [])


def test_sha256_long_single_block_matches_one_block_generator():
    from reverie_tpu.circuit.sha256 import (
        sha256_long_preimage_statement,
        sha256_pad_message,
        sha256_preimage_statement,
    )

    msg = b"short"
    digest = hashlib.sha256(msg).digest()
    assert sha256_pad_message(msg) == sha256_pad_one_block(msg)
    prog1, _ = sha256_preimage_statement(digest)
    progN, _ = sha256_long_preimage_statement(digest, 1)
    assert prog1 == progN
