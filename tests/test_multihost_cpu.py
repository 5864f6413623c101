"""Multi-host (DCN) execution test — SURVEY §5 comm-backend row.

Drives scripts/multihost_cpu_dryrun.py: a REAL 2-process × 4-device
jax.distributed gloo mesh running the sharded scan, delta-append, and
sharded-IVF probe, each oracle-equal to single-process numpy.  Everything
else in the suite is single-process over 8 virtual devices; this is the
one place cross-process collectives actually execute.
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_mesh_parity():
    # No PIXELBOX_MH_PORT: the launcher binds an ephemeral port, so two
    # concurrent suite runs (or a stale worker from a killed run) can't
    # collide and flake into the 600 s timeout (ADVICE r4).
    env = {k: v for k, v in os.environ.items() if k != "PIXELBOX_MH_PORT"}
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "multihost_cpu_dryrun.py")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-2000:]
    assert "MULTIHOST_DRYRUN PASS" in r.stdout
