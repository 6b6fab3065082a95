"""reverie_tpu -- a TPU-native KKW MPC-in-the-head proof system.

A from-scratch JAX/XLA/Pallas implementation of the NIZKPoK from KKW 2018
("Improved Non-Interactive Zero Knowledge with Applications to Post-Quantum
Signatures"), with the capabilities of trailofbits/reverie: prover + verifier
for circuits over GF(2) and Z_2^64 including mixed circuits with B2A
conversion gates, 8-player / 256-repetition / 40-online parameters at 128-bit
classical security, and byte-compatible proof and program formats.
"""

from .params import (
    BATCH_SIZE,
    DEFAULT_PARAMS,
    HASH_SIZE,
    KEY_SIZE,
    ONLINE_REPS,
    PACKED,
    PACKED_REPS,
    PLAYERS,
    PREPROCESSING_REPS,
    TOTAL_REPS,
    ProtocolParams,
)

__version__ = "0.1.0"
