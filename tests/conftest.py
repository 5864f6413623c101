"""Test harness config.

Tests run on CPU with 8 virtual devices so multi-chip sharding
(``pixelbox_tpu.parallel``) is exercised without TPU hardware, per the
driver's dry-run model.  Must run before jax is imported anywhere.
"""

import faulthandler
import os
import sys

# A hard crash (segfault/abort in native code or XLA) should name its
# test: one full-suite run died with a bare "Fatal Python error:" and no
# context (not reproduced since).
faulthandler.enable()

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_enable_fast_math" not in _flags:
    # XLA:CPU's fast-math turns dynamic f32 division into a 1-ulp-off
    # reciprocal multiply, breaking bit-exact parity checks vs the numpy
    # oracle.  (TPU values may still differ by ulps from the oracle; the
    # parity that matters there — top-k ordering — is tested separately.)
    _flags = (_flags + " --xla_cpu_enable_fast_math=false").strip()
os.environ["XLA_FLAGS"] = _flags

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# The environment force-selects the 'axon' TPU-tunnel platform even over
# JAX_PLATFORMS=cpu; a post-import config update wins.  Tests must run on
# the virtual 8-device CPU mesh (and bit-exact f32 division).
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache, keyed by a machine fingerprint: XLA:CPU AOT
# results compiled on a different microarch must never load here (a stale
# shared cache produced `cpu_aot_loader` machine-mismatch errors and risks
# SIGILL mid-suite).  NOTE: XLA still logs cpu_aot_loader lines citing
# ONLY `+prefer-no-scatter`/`+prefer-no-gather` — those are XLA tuning
# pseudo-features that never appear in the host feature list, i.e. a
# same-machine false positive, not a microarch mismatch (every real ISA
# feature in those lines matches).
from pixelbox_tpu.utils.jaxcache import machine_fingerprint

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(_REPO, ".jax_cache", machine_fingerprint()),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import hashlib

import numpy as np
import pytest


@pytest.fixture
def rng(request):
    """Per-test deterministic RNG, seeded from the test's node id.

    Session-scoped streams made every test's data depend on which tests
    ran before it (a k-means purity assert flaked order-dependently);
    per-node seeding makes any subset of files reproduce the full-suite
    inputs exactly.
    """
    seed = int.from_bytes(
        hashlib.sha256(request.node.nodeid.encode()).digest()[:4], "little"
    )
    return np.random.default_rng(seed)
