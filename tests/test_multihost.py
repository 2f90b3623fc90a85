"""Multi-host scaffolding: 2-process jax.distributed simulation (CPU).

Runs in subprocesses so the test process's 8-virtual-device backend is
untouched.  Validates: cross-process device discovery, global mesh,
host-local batch slicing, make_array_from_process_local_data assembly,
GSPMD collectives spanning processes, identical replicated results.
"""

import os
import subprocess
import sys


def test_two_process_simulation():
    sim = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "multiprocess_sim.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["SIM_PORT"] = "18745"   # avoid clashing with a concurrent dryrun
    r = subprocess.run([sys.executable, sim], env=env, timeout=540,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-2000:]
    assert "MULTIPROCESS SIM OK" in r.stdout
