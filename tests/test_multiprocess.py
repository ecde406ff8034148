"""Multi-process `jax.distributed` bring-up (SURVEY.md §4.4, VERDICT r2 #6).

Spawns 2 real OS processes that form a CPU cluster via
``jax.distributed.initialize`` (loopback coordinator), build one global
mesh over 4 devices (2 per process), and run sharded train steps whose
parameter gradients all-reduce across the process boundary — the code path
single-process virtual-mesh tests (test_dist.py) and the MULTICHIP dryrun
never touch.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "dist_worker.py",
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_train_step():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    # Both controllers must report the identical (all-reduced) loss.
    lines = [
        [ln for ln in out.splitlines() if ln.startswith("OK loss=")][-1]
        for out in outs
    ]
    assert lines[0] == lines[1], lines
    # Both controllers ran the pallas kernel path across the process
    # boundary and matched the single-process trace (VERDICT r4 weak #6).
    for out in outs:
        assert "OK pallas-crossproc" in out, out[-3000:]
