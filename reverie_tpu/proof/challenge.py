"""Fiat-Shamir challenge derivation (reference src/proof/mod.rs:68-100).

Replicates the reference exactly, including its quirks (SURVEY.md section 5
caveat 2): `u128 LE % bound` sampling (negligible modulo bias) and
HashMap overwrite-on-duplicate semantics during drawing.
"""

from __future__ import annotations

from typing import Dict, List

from ..crypto import RandomOracle
from ..params import ProtocolParams

CTX_CHALLENGE = "random-oracle challenge"


def _random_int(ro: RandomOracle, bound: int) -> int:
    return int.from_bytes(ro.fill(16), "little") % bound


def challenge_to_opening(comm: bytes, params: ProtocolParams) -> Dict[int, int]:
    """comm -> {rep_index: omitted_player}; re-drawing an existing rep
    overwrites its omit player (proof/mod.rs:74-83)."""
    ro = RandomOracle(CTX_CHALLENGE, comm)
    online: Dict[int, int] = {}
    while len(online) < params.online_reps:
        rep = _random_int(ro, params.total_reps)
        omit = _random_int(ro, params.players)
        online[rep] = omit
    return online


def opening_to_packed(open_map: Dict[int, int], params: ProtocolParams) -> List[List[int]]:
    """Per packed group: 8 omit indices, players (=8) meaning 'open
    preprocessing instead' (proof/mod.rs:85-100)."""
    packed = []
    for g in range(params.packed_reps):
        row = []
        for j in range(params.packed):
            idx = g * params.packed + j
            row.append(open_map.get(idx, params.players))
        packed.append(row)
    return packed
