"""Real multi-process `jax.distributed` test (VERDICT r3 item 6).

Spawns TWO local processes that each run `initialize_multihost` against a
localhost coordinator (CPU backend, 4 virtual devices per process), build
the shared `global_data_mesh` spanning all 8 global devices, and agree on
a cross-process psum — turning `parallel/distributed.py` from config
plumbing into verified capability.  The reference has no distributed
story at all (SURVEY §5.8: no NCCL/MPI anywhere); this is the rebuild's
DCN-analogue evidence.
"""

import os
import socket
import subprocess
import sys

_CHILD = os.path.join(os.path.dirname(__file__), "_multihost_child.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_psum(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no axon/TPU in children
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # Children compile trivial programs only; keep them out of the shared
    # persistent cache (writes there are banned for CPU, see conftest).
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "cache")
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, _CHILD, str(port), str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid} 8" in out, out
