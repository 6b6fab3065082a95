from .hashing import (
    HASH_SIZE,
    RandomOracle,
    blake3,
    blake3_many,
    blake3_xof,
    combine_hashes,
    hash_pair,
)
from .prg import expand_seed, expand_seeds, key_expand_batch, keystream, keystream_batch

__all__ = [
    "HASH_SIZE",
    "RandomOracle",
    "blake3",
    "blake3_many",
    "blake3_xof",
    "combine_hashes",
    "hash_pair",
    "expand_seed",
    "expand_seeds",
    "key_expand_batch",
    "keystream",
    "keystream_batch",
]
