"""Two-process (simulated two-host) mesh: distributed init, host-local
loading, halo sharding, psum counts — the multi-host half of K15.

Spawns two real jax processes (4 virtual CPU devices each) that form one
(2-host x 4-chip) cluster over Gloo collectives and run the find suite's
sharded counting program on a corpus neither host fully loads.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_host_find_count():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
        env.update(
            SWTPU_COORDINATOR=f"127.0.0.1:{port}",
            SWTPU_NUM_PROCESSES="2",
            SWTPU_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, worker],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=280)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    results = [line for out in outs for line in out.splitlines() if line.startswith("RESULT")]
    assert len(results) == 2, outs
    # Both workers computed the same global count, on a <2host> scope.
    assert results[0] == results[1]
    assert "scope=<2host>" in results[0]
    assert "count=" in results[0]
