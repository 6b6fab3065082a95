from .challenge import challenge_to_opening, opening_to_packed
from .container import OpenOnline, OpenPreprocessing, Proof, ProofSingle
from .prove import prove, verify

__all__ = [
    "challenge_to_opening",
    "opening_to_packed",
    "OpenOnline",
    "OpenPreprocessing",
    "Proof",
    "ProofSingle",
    "prove",
    "verify",
]
