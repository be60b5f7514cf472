"""Two-process jax.distributed smoke test on the CPU backend (no pod)."""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from ntjoin_tpu.parallel.distributed import initialize, global_mesh, gather_counts
pid = int(sys.argv[1])
initialize({coord!r}, 2, pid, local_device_count=4)
mesh = global_mesh()
assert mesh.devices.size == 8, mesh.devices.size
total = gather_counts(mesh, 10 + pid)
print("TOTAL", total, flush=True)
"""


def test_two_process_mesh(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO, coord=coord))
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, err
        outs.append(out)
    # per-device values: 4 devices with 10, 4 with 11 -> 84
    for out in outs:
        assert "TOTAL 84" in out


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
