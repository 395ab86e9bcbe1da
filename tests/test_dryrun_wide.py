"""The full multi-chip dry-run at wider virtual meshes (16 / 32 devices).

The driver validates ``__graft_entry__.dryrun_multichip`` at its own
device count; these tests extend the evidence to pod-slice-like widths
on virtual CPU meshes (the conftest pins this process to 8 devices, so
each width runs in a fresh subprocess). Covers the 2-D-sharded training
step, row-sharded distributed Cholesky/solves/append (f32 + bf16
storage), sharded predict, chain-sharded NUTS, and the LargeScaleGP
fit/predict/append path at every width.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
@pytest.mark.parametrize("n_devices", [16, 32])
def test_dryrun_multichip_wide(n_devices):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices}"
    )
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import os\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as g\n"
        f"g.dryrun_multichip({n_devices})\n"
        "print('WIDE_OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip({n_devices}) failed:\n"
        f"stdout: {proc.stdout[-2000:]}\nstderr: {proc.stderr[-4000:]}"
    )
    assert "WIDE_OK" in proc.stdout
