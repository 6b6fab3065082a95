"""Dump the structure of a bincode proof file (debugging aid).

    python tools/inspect_proof.py proof.bin

Prints the Fiat-Shamir commitment, per-domain opening counts, omitted-player
indices, and stream sizes -- the fields a verifier consumes
(proof/container.py; reference layout proof/mod.rs:40-66).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reverie_tpu.proof import Proof


def describe(name: str, ps) -> None:
    print(f"[{name}] {len(ps.online)} online openings, "
          f"{len(ps.preprocessing)} preprocessing openings")
    if ps.online:
        omits = [o.omit for o in ps.online]
        o = ps.online[0]
        print(f"  omit values: {omits}")
        print(f"  per opening: seeds {len(o.seeds)} B, recons {len(o.recons)} B, "
              f"corrs {len(o.corrs)} B, inputs {len(o.inputs)} B")
    if ps.preprocessing:
        p = ps.preprocessing[0]
        print(f"  per preprocessing: seed {len(p.seed)} B, "
              f"online commitment {len(p.comm_online)} B")


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    blob = open(sys.argv[1], "rb").read()
    proof = Proof.from_bytes(blob)
    print(f"{sys.argv[1]}: {len(blob)} bytes")
    print(f"commitment: {proof.comm.hex()}")
    describe("gf2", proof.gf2)
    describe("z64", proof.z64)
    return 0


if __name__ == "__main__":
    sys.exit(main())
