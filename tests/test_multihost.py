"""Multi-process (multi-host analog) integration test.

Spawns real separate Python processes, each owning 2 virtual CPU devices,
joined via jax.distributed + gloo CPU collectives. The database is sharded
across the process boundary and the sharded search's all-gather top-k merge
must produce exact results on every process — the closest CI-able analog of
the DCN multi-host path (SURVEY §2.6; scann_tpu/parallel/multihost.py).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("num_procs", [2])
def test_multiprocess_sharded_search(num_procs):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(num_procs), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for i in range(num_procs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"multihost workers timed out; partial output: {outs}")
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and (
                "gloo" in out.lower() and "unknown" in out.lower()):
            pytest.skip(f"gloo collectives unavailable: {out[-500:]}")
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "multihost sharded search OK" in out
        assert "multihost sharded tree-AH OK" in out
