""">8-device and non-divisor single-proof mesh scaling (round-5 VERDICT
items: the capability existed but nothing in CI exercised D > 8, and
non-divisor device counts used to silently downgrade).

Runs in a subprocess because the suite's conftest pins the main process to
8 virtual devices; the child gets its own XLA_FLAGS (template:
tests/test_distributed.py).  The prover pads the repetition axis to a mesh
multiple with dummy zero-key lanes (TpuKKW._rep_pad, mirrored from the
verifier's 40/216-rep padding); proof bytes must equal the unsharded
golden.  Reference analog: rayon parallelism over any number of packed
groups (/root/reference/src/proof/mod.rs:249,266)."""

import os
import subprocess
import sys

import pytest

_CHILD = r"""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from reverie_tpu.backend.tpu_host import TpuKKW
from reverie_tpu.circuit.builders import mul_bench_circuit
from reverie_tpu.parallel import make_mesh

D = int(__import__("sys").argv[1])
assert len(jax.devices()) >= D, jax.devices()
prog, wit2, witz = mul_bench_circuit(48)
seeds = np.arange(256 * 16, dtype=np.uint8).reshape(256, 16) % 251
base = TpuKKW(prog).prove(wit2, witz, seeds=seeds)
sys_ = TpuKKW(prog, mesh=make_mesh(D))
p = sys_.prove(wit2, witz, seeds=seeds)
assert p.to_bytes() == base.to_bytes(), "sharded proof bytes differ"
assert sys_.verify(p), "sharded verify rejected"
print(f"OK D={D}")
"""


def _run(n_devices: int, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices}"
    )
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, str(n_devices)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert f"OK D={n_devices}" in r.stdout


def test_16_device_single_proof_byte_identity(tmp_path):
    """16 vdevs: one proof sharded past the gcd(256,40,216)=8 boundary
    (verifier re-executions pad 40->48, 216->224 rep lanes)."""
    _run(16, tmp_path)


@pytest.mark.slow
def test_12_device_non_divisor_mesh(tmp_path):
    """12 vdevs: 256 % 12 != 0 -- the prover pads 256->264 rep lanes
    instead of downgrading the mesh."""
    _run(12, tmp_path)
