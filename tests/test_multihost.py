"""True multi-process distributed test: two jax.distributed processes, one
mesh spanning both, collectives crossing the process boundary over TCP —
the same code path that rides DCN on a real multi-host pod."""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SIM = REPO / "scripts" / "multihost_sim.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_pipeline():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(SIM), str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            cwd=REPO,
            env={
                k: v
                for k, v in __import__("os").environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
            },
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process run timed out")
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"process failed: {err[-2000:]}"
    assert "MULTIHOST_OK" in outs[0][1]
