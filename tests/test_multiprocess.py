"""Multi-PROCESS mesh gate (SURVEY §2.9 "per-host input sharding,
multi-host-safe checkpointing"): wraps scripts/multiprocess_dryrun.py —
2 jax.distributed processes x 4 virtual CPU devices = one 8-device
data:4 x fsdp:2 mesh, per-host input slices, 2 sharded GAN steps,
single-writer checkpoint + restore/reshard/step.

Opt-in (TRAINNER_MP_TEST=1): the run spawns two fresh processes that
each compile the sharded step on the 1-core host (~3-5 min), far too
heavy for the default suite. CI-of-record: the script is run directly
each round (docs/round5.md §7).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("TRAINNER_MP_TEST") != "1",
                    reason="opt-in: set TRAINNER_MP_TEST=1 (spawns two "
                           "jax.distributed processes, ~minutes)")
def test_multiprocess_dryrun():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "multiprocess_dryrun.py")],
        capture_output=True, text=True, timeout=900, cwd=REPO)
    if proc.returncode == 3:
        pytest.skip("backend lacks cross-process collectives")
    assert proc.returncode == 0, proc.stdout[-2000:]
    assert "MP_DRYRUN_OK (both processes)" in proc.stdout
