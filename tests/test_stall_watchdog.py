"""Stall watchdog (utils.start_stall_watchdog): the hung-dispatch guard.

TPU-production hardening with no reference analog — a wedged backend
dispatch blocks the train loop inside native code (observed r3), and the
only recovery is a process exit + checkpoint resume (the production
restart loop). os._exit semantics force the fire/no-fire cases into
subprocesses."""

import os
import subprocess
import sys

import numpy as np

from tests.test_runner_train import make_args, make_cfg

import pytest

# compile-heavy / subprocess module: excluded from the quick tier
pytestmark = pytest.mark.heavy

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_snippet(code: str, timeout=60):
    return subprocess.run([sys.executable, "-c", code], timeout=timeout,
                          capture_output=True, text=True,
                          cwd=REPO)


def test_watchdog_fires_on_stale_heartbeat():
    r = _run_snippet("""
import time
from mcvd_tpu.utils import start_stall_watchdog
hb = {"t": time.monotonic(), "step": 7, "suspended": False}
start_stall_watchdog(hb, timeout_s=1.0, interval_s=0.2)
time.sleep(30)   # never bumps the heartbeat -> watchdog must exit first
""")
    assert r.returncode == 112, (r.returncode, r.stderr)


def test_watchdog_quiet_while_heartbeat_bumps_or_suspended():
    r = _run_snippet("""
import time
from mcvd_tpu.utils import start_stall_watchdog
hb = {"t": time.monotonic(), "step": 0, "suspended": False}
start_stall_watchdog(hb, timeout_s=1.0, interval_s=0.2)
for i in range(8):           # live loop: bump inside the window
    time.sleep(0.4)
    hb["t"] = time.monotonic(); hb["step"] = i
hb["suspended"] = True       # long legit eval: parked, no fire
time.sleep(2.5)
hb["suspended"] = False      # resume restarts the timer
time.sleep(0.5)
print("SURVIVED")
""")
    assert r.returncode == 0, (r.returncode, r.stderr)
    assert "SURVIVED" in r.stdout


def test_runner_train_with_watchdog_armed(tmp_path):
    """Normal training with training.stall_timeout armed completes (the
    heartbeat wiring keeps the watchdog quiet through sync/val barriers)."""
    from mcvd_tpu.runners.runner import Runner

    cfg = make_cfg(str(tmp_path), stall_timeout=300, sync_every=2)
    args = make_args(str(tmp_path))
    state = Runner(args, cfg).train()
    assert int(state.step) == 5
    for leaf in __import__("jax").tree_util.tree_leaves(state.params):
        assert bool(np.isfinite(np.asarray(leaf)).all())
