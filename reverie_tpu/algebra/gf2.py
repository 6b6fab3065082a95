"""Packed GF(2) algebra, vectorized over repetition groups.

Layouts generalize the reference's single-u64 packing (8 reps x 8 players,
one bit each; bit index (7-rep)*8 + (7-player), src/algebra/gf2/share.rs:23-24)
to NumPy arrays with a leading group axis: a value is an array of u64 words,
one word per packed group of 8 repetitions.

  Share : uint64[...]: bit (7-r)*8+(7-p) = share of (rep r, player p)
  Recon : uint64[...]: byte (7-r) in LSB-order (== BE byte r) is 0x00/0xFF

All operations are elementwise over the group axis, so the whole 256-rep
execution (32 groups) is one vector op -- the reference's headline trick
(README.md:34-38) widened to the full repetition count.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_LANE = U64(0x0101010101010101)


# ---- ring ops --------------------------------------------------------------


def share_add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a ^ b


share_sub = share_add


def share_mul_recon(s: np.ndarray, r: np.ndarray) -> np.ndarray:
    # share x recon = AND (gf2/domain.rs:10-18)
    return s & r


def share_add_recon(s: np.ndarray, r: np.ndarray) -> np.ndarray:
    # recon lands in the bit-0 lane of each rep byte (gf2/domain.rs:20-30)
    return s ^ (r & _LANE)


share_sub_recon = share_add_recon


def recon_add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a ^ b


recon_sub = recon_add


def recon_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a & b


def reconstruct(share: np.ndarray) -> np.ndarray:
    """XOR-fold the 8 player bits of each rep byte, broadcast to fill the
    byte (gf2/domain.rs:47-63)."""
    t = share ^ (share >> U64(4))
    t = t ^ (t >> U64(2))
    t = t ^ (t >> U64(1))
    t = t & _LANE
    t = t | (t << U64(1))
    t = t | (t << U64(2))
    t = t | (t << U64(4))
    return t


def recon_from_bool(bit) -> U64:
    return U64(0xFFFFFFFFFFFFFFFF) if bit else U64(0)


def recon_to_bits(recon: np.ndarray) -> np.ndarray:
    """(..., ) u64 recon -> (..., 8) uint8 bits, index = rep within group."""
    return (rep_bytes(recon) & 1).astype(np.uint8)


def rep_bytes(x: np.ndarray) -> np.ndarray:
    """u64 array (...,) -> (..., 8) uint8 where byte index = rep in group
    (big-endian byte order, matching Hashable impls gf2/{share,recon}.rs)."""
    return x[..., None].astype(U64).byteswap().view(np.uint8).reshape(*x.shape, 8)


def from_rep_bytes(b: np.ndarray) -> np.ndarray:
    """(..., 8) uint8 (byte index = rep) -> u64 array."""
    b = np.ascontiguousarray(b, dtype=np.uint8)
    return b.reshape(-1, 8).view(">u8").astype(U64).reshape(b.shape[:-1])


# ---- tape ------------------------------------------------------------------


def tape_to_shares(keystream_bits: np.ndarray) -> np.ndarray:
    """Transpose per-player keystreams into packed share words.

    keystream_bits: (G, R8, P8, S) uint8 bits in tape order (the bit-s of the
    (g,r,p) keystream, MSB-first within bytes -- exactly np.unpackbits of the
    raw AES-CTR keystream).  Returns (S, G) uint64 share words.

    Counterpart of the reference's 64x64 SIMD bit transpose
    (gf2/domain.rs:85-378) for all groups at once.
    """
    G, R, P, S = keystream_bits.shape
    assert R == 8 and P == 8
    # order (S, G, r, p) then pack bits MSB-first -> BE u64
    bits = np.transpose(keystream_bits, (3, 0, 1, 2)).reshape(S, G, 64)
    packed = np.packbits(bits, axis=-1)  # (S, G, 8) bytes, MSB-first
    return packed.view(">u8").astype(U64).reshape(S, G)


def gf2_tape_from_keystreams(ks: np.ndarray, n_shares: int) -> np.ndarray:
    """ks: (G, 8, 8, nbytes) uint8 raw AES-CTR keystream -> (n_shares, G) u64.

    The share stream consumes keystream bits MSB-first per byte
    (gf2/batch.rs:17-21 + byte_to_shares bit order)."""
    bits = np.unpackbits(ks, axis=-1)
    return tape_to_shares(bits[..., :n_shares])


# ---- wire formats (Pack / PackSelected), byte-exact ------------------------


def pack_recon(recons: np.ndarray, group_selected: np.ndarray) -> list:
    """Serialize recon values per repetition.

    recons: (N, G) u64.  group_selected: (G, 8) bool -- which (group, rep)
    streams to emit.  Returns list of per-(g,r) byte arrays in (g,r) order
    for selected entries only... wait, callers index by (g, r).

    Byte layout (gf2/recon.rs:126-259): byte k of rep-r stream packs recons
    [8k..8k+8) with recon j at bit (7-j); a trailing zero-padded byte is
    ALWAYS emitted for the remainder chunk, even when N % 8 == 0.
    """
    N, G = recons.shape
    n_chunks = N // 8 + 1  # reference quirk: remainder always emitted
    padded = np.zeros((n_chunks * 8, G), dtype=U64)
    padded[:N] = recons
    bits = (rep_bytes(padded) & 1).astype(np.uint8)  # (n*8, G, 8reps)
    # byte k bit (7-j) = recon 8k+j  -> packbits over the recon-in-chunk axis
    bits = bits.reshape(n_chunks, 8, G, 8)
    bits = np.transpose(bits, (2, 3, 0, 1))  # (G, rep, chunk, 8)
    by = np.packbits(bits.reshape(G, 8, n_chunks * 8), axis=-1)  # (G, 8, n_chunks)
    out = {}
    for g in range(G):
        for r in range(8):
            if group_selected[g, r]:
                out[(g, r)] = by[g, r].tobytes()
    return out


def unpack_recon(streams: list) -> np.ndarray:
    """streams: list of 8 equal-length byte strings (one per rep in group).
    Returns (N, ) u64 recon words for one group (gf2/recon.rs unpack)."""
    arrs = [np.frombuffer(s, dtype=np.uint8) for s in streams]
    length = len(arrs[0])
    assert all(len(a) == length for a in arrs)
    by = np.stack(arrs, axis=0)  # (8, nbytes)
    bits = np.unpackbits(by, axis=-1)  # (8, nbytes*8): recon index axis
    # recon i, rep r -> byte (0x00/0xFF) at BE byte r
    vals = np.where(bits.T.astype(bool), 0xFF, 0).astype(np.uint8)  # (N, 8)
    return from_rep_bytes(vals)


def pack_selected_shares(shares: np.ndarray, omit: np.ndarray, group_selected: np.ndarray) -> dict:
    """Extract the omitted player's broadcast bit-stream per selected rep.

    shares: (N, G) u64; omit: (G, 8) int (player index, 8 = none).
    Byte layout (gf2/share.rs:87-146): byte k bit (7-j) = share 8k+j's bit of
    player omit; trailing remainder byte always emitted.
    """
    N, G = shares.shape
    n_chunks = N // 8 + 1
    padded = np.zeros((n_chunks * 8, G), dtype=U64)
    padded[:N] = shares
    out = {}
    for g in range(G):
        for r in range(8):
            if not group_selected[g, r]:
                continue
            p = int(omit[g, r])
            shift = U64((7 - r) * 8 + (7 - p))
            bits = ((padded[:, g] >> shift) & U64(1)).astype(np.uint8)
            by = np.packbits(bits.reshape(n_chunks, 8), axis=-1).reshape(-1)
            out[(g, r)] = by.tobytes()
    return out


def unpack_selected_shares(streams: list, omit: list) -> np.ndarray:
    """streams: 8 equal-length byte strings; omit: 8 player indices.
    Returns (N, ) u64 share words (only the omitted player's bit set per rep)
    for one group (gf2/share.rs:148-208)."""
    arrs = [np.frombuffer(s, dtype=np.uint8) for s in streams]
    length = len(arrs[0])
    assert all(len(a) == length for a in arrs)
    result = np.zeros(length * 8, dtype=U64)
    for r in range(8):
        bits = np.unpackbits(arrs[r])  # share index axis
        shift = U64((7 - r) * 8 + (7 - int(omit[r])))
        result |= bits.astype(U64) << shift
    return result
