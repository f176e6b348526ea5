import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_render_and_grad():
    """Full multi-host code path on one machine: 2 processes x 4 virtual
    devices via jax.distributed — sharded render, process_allgather, and the
    cross-process gradient psum, all compared against single-process
    results (tools/multiprocess_demo.py)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the demo sets its own device count
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multiprocess_demo.py"),
         "--port", "57633"],
        capture_output=True, text=True, timeout=540, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIPROCESS_OK" in out.stdout, out.stdout
