"""Cross-process (DCN-sim) coverage: the multihost script must pass both
production paths — DP training AND dp×mp distributed search parity — across
real process boundaries (jax.distributed + Gloo), not just in-process
virtual meshes."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    # A fixed port collides with any concurrent/stale coordinator (two suites
    # racing on one box produce "connected with a different incarnation"
    # aborts from the coordination service); bind port 0 and use what the OS
    # hands out.
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(280)
def test_multihost_sim_two_processes():
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS",)}
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_sim.py"),
         "--hosts", "2", "--devices-per-host", "2",
         "--port", str(_free_port())],
        env=env, capture_output=True, text=True, timeout=260)
    assert out.returncode == 0, out.stderr[-2000:]
    ok_lines = [l for l in out.stdout.splitlines()
                if l.startswith("MULTIHOST_OK")]
    assert ok_lines, out.stdout[-2000:]
    assert "search_parity=ok" in ok_lines[0], ok_lines[0]
