"""True multi-process distributed solve: 2 JAX processes x 4 virtual CPU
devices = one global 8-device mesh, coordinated by jax.distributed.

This is the DCN-analog test SURVEY.md section 4.3 prescribes for the
sharded batch path ("CPU-backend multi-process JAX tests"): unlike the
in-process 8-device tests, data crosses a real process boundary, the
mesh mixes addressable and non-addressable devices, and the BatchStats
reductions run through the coordination service.
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


def test_two_process_global_mesh_sharded_solve():
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo_root, "tests", "mp_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    # Workers force the CPU backend themselves (jax.config.update) —
    # the ambient env may pin a TPU platform.
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid}: OK" in out
