"""Multi-process `jax.distributed` test: 2 processes x 2 virtual CPU devices
form a (kf=2, pt=2) mesh (Gloo collectives standing in for DCN, per the
SURVEY §4 multi-host test strategy); the sharded NID loss must equal the
single-process value. The reference has no multi-process path at all — this
covers the rebuild's `jax.distributed` runtime (parallel/mesh.py)."""

import os
import socket
import subprocess
import sys

def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_nid_matches_local():
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([repo, here, env.get("PYTHONPATH", "")])
    # The worker flips to CPU itself; scrub any preset platform/device flags.
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""
    port = str(_free_port())
    worker = os.path.join(here, "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), port],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "MULTIHOST_OK" in out, f"proc {i} output:\n{out}"
