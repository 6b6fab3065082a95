"""Packed Z_2^64 ring algebra, vectorized over repetition groups.

Layouts (reference src/algebra/z64/):
  Share : uint64[..., G, 8, 8]  -- one u64 per (group, rep, player)
  Recon : uint64[..., G, 8]     -- one u64 per (group, rep)

All arithmetic is wrapping (mod 2^64); NumPy uint64 wraps natively.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64


def share_add(a, b):
    return a + b


def share_sub(a, b):
    return a - b


def share_neg(a):
    return U64(0) - a


def share_mul_recon(s, r):
    # every player's share scaled (z64/domain.rs:4-16)
    return s * r[..., None]


def share_add_recon(s, r):
    # recon added to player 0's share only (z64/domain.rs:21-30)
    out = s.copy()
    out[..., 0] += r
    return out


def share_sub_recon(s, r):
    out = s.copy()
    out[..., 0] -= r
    return out


def recon_add(a, b):
    return a + b


def recon_sub(a, b):
    return a - b


def recon_mul(a, b):
    return a * b


def reconstruct(share):
    # wrapping sum over players (z64/domain.rs:52-60)
    return share.sum(axis=-1, dtype=U64)


def recon_from_u64(val, G):
    return np.full((G, 8), U64(val), dtype=U64)


# ---- hashing byte layouts --------------------------------------------------


def share_hash_bytes(share: np.ndarray) -> np.ndarray:
    """(..., G, 8, 8) -> (..., G, 8, 64) uint8: per rep, all 8 players' u64
    little-endian (z64/share.rs:100-108)."""
    return share.astype("<u8").view(np.uint8).reshape(*share.shape[:-1], 64)


def recon_hash_bytes(recon: np.ndarray) -> np.ndarray:
    """(..., G, 8) -> (..., G, 8, 8) uint8: per rep u64 LE
    (z64/recon.rs:133-137)."""
    return recon[..., None].astype("<u8").view(np.uint8).reshape(*recon.shape, 8)


# ---- tape ------------------------------------------------------------------


def z64_tape_from_keystreams(ks: np.ndarray, n_shares: int) -> np.ndarray:
    """ks: (G, 8, 8, nbytes) uint8 keystream -> (n_shares, G, 8, 8) u64.

    The Z64 batch interprets the keystream as 128 LE u64 per 1KiB refill
    (z64/batch.rs:25-30); the share stream is simply consecutive LE u64s."""
    G = ks.shape[0]
    words = np.ascontiguousarray(ks).view("<u8").astype(U64)  # (G,8,8,nwords)
    words = words[..., :n_shares]
    return np.transpose(words, (3, 0, 1, 2))


# ---- wire formats ----------------------------------------------------------


def pack_recon(recons: np.ndarray, group_selected: np.ndarray) -> dict:
    """recons: (N, G, 8) u64 -> {(g, r): bytes} LE u64 stream per selected
    rep (z64/recon.rs:44-68)."""
    N, G, R = recons.shape
    le = recons.astype("<u8").view(np.uint8).reshape(N, G, R, 8)
    out = {}
    for g in range(G):
        for r in range(R):
            if group_selected[g, r]:
                out[(g, r)] = np.ascontiguousarray(le[:, g, r]).tobytes()
    return out


def unpack_recon(streams: list) -> np.ndarray:
    """8 equal-length LE byte streams -> (N, 8) u64 for one group."""
    arrs = [np.frombuffer(s, dtype="<u8").astype(U64) for s in streams]
    return np.stack(arrs, axis=1)  # (N, 8reps)


def pack_selected_shares(shares: np.ndarray, omit: np.ndarray, group_selected: np.ndarray) -> dict:
    """shares: (N, G, 8, 8); omit: (G, 8) -> {(g, r): bytes} -- the omitted
    player's u64 LE stream (z64/share.rs:36-49)."""
    N, G, R, P = shares.shape
    out = {}
    for g in range(G):
        for r in range(R):
            if group_selected[g, r]:
                p = int(omit[g, r])
                out[(g, r)] = shares[:, g, r, p].astype("<u8").tobytes()
    return out


def unpack_selected_shares(streams: list, omit: list) -> np.ndarray:
    """8 LE byte streams + omit players -> (N, 8, 8) u64 share words with
    only the omitted player's coordinate set (z64/share.rs:51-95)."""
    arrs = [np.frombuffer(s, dtype="<u8").astype(U64) for s in streams]
    N = len(arrs[0])
    out = np.zeros((N, 8, 8), dtype=U64)
    for r in range(8):
        out[:, r, int(omit[r])] = arrs[r]
    return out
