"""Driver entry-point checks: single-chip forward compiles and the full
multi-chip training step compiles + executes on a virtual 8-device CPU mesh
(the axon TPU plugin must be disabled via env for the CPU mesh to appear)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_mesh_env(n=8):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disable axon TPU registration
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
    return env


@pytest.mark.slow
def test_graft_entry_and_multichip_dryrun():
    code = (
        "import __graft_entry__ as g, jax\n"
        "fn, args = g.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "assert out[0].shape == (8, 82)\n"
        "g.dryrun_multichip(8)\n"
        "print('GRAFT_OK')\n"
    )
    result = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_cpu_mesh_env(8),
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    assert "GRAFT_OK" in result.stdout
    assert "dryrun_multichip(8) ok" in result.stdout
