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


def make_system(program, params=DEFAULT_PARAMS, mesh=None,
                hbm_budget_bytes=None):
    """Build the right prover/verifier for a circuit's size: the in-HBM
    `TpuKKW` when its device footprint fits the budget, the O(segment)
    streaming `StreamingKKW` otherwise (segment size chosen to fit).  Both
    produce identical proof bytes; this is the "any circuit size just works"
    entry point.

    hbm_budget_bytes: device memory to plan for (default: env
    REVERIE_HBM_BUDGET or 12 GiB -- a single v5e chip is 16 GiB)."""
    import os

    if hbm_budget_bytes is None:
        hbm_budget_bytes = int(
            os.environ.get("REVERIE_HBM_BUDGET", 12 * 1024**3)
        )
    R = params.total_reps

    def footprint(n_ops: int) -> int:
        # dominant device arrays scale linearly in ops (tape rows, transcript
        # streams, gate tables, value arenas); ~2 bytes/op/rep covers the
        # GF2 streams + tape + arena with headroom, z64 ops cost ~80x more
        from .circuit.ir import Kind

        cost = 0
        for op in program:
            if op.kind == Kind.GF2:
                cost += 2 * R
            elif op.kind == Kind.Z64:
                cost += 160 * R
            elif op.kind == Kind.B2A:
                cost += 200 * 2 * R  # expands to ~200 gf2 gates + z64 events
        return cost

    total = footprint(len(program))
    if total <= hbm_budget_bytes:
        from .backend.tpu_host import TpuKKW

        return TpuKKW(program, params=params, mesh=mesh)
    from .backend.streaming import StreamingKKW

    # pick a segment size so one segment's footprint is ~1/8 of budget
    frac = max(1, int(len(program) * (hbm_budget_bytes / 8) / max(total, 1)))
    return StreamingKKW(program, frac, params=params, mesh=mesh)
