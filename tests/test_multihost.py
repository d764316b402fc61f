"""Multi-host launch path: 2 real processes over localhost (simulated DCN),
each with 2 virtual CPU devices, joined by jax.distributed.initialize via
the KPT_* env contract (parallel/multihost.py)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cpu_smoke():
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_mh_worker.py")

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            KPT_COORDINATOR=f"127.0.0.1:{port}",
            KPT_NUM_PROCESSES="2",
            KPT_PROCESS_ID=str(pid),
        )
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(
            subprocess.Popen(
                [sys.executable, worker], env=env, cwd=root,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )

    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))

    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        assert "PSUM_OK" in out and "RENDER_OK" in out, out
