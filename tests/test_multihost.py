"""Multi-host DCN dryrun (2 fake hosts x 4 CPU devices, jax.distributed)."""
import os
import subprocess
import sys

def test_dryrun_multihost():
    """The carrier bank runs over a jax.distributed 2-process mesh with
    per-carrier decode asserted on every host (BASELINE.md config 5)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tool = os.path.join(root, "tools", "dryrun_multihost.py")
    # spawn with a clean env: the workers pick their own platform flags
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run([sys.executable, tool], env=env, timeout=850,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "dryrun_multihost: OK" in r.stdout
