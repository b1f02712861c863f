"""Composite forward parity vs the torch reference (VERDICT r3 #3).

Runs tests/composite_parity_impl.py in a subprocess: the impl installs
CPU shims for torchsparse / the grid-sample CUDA extension / mcubes into
sys.modules and patches torch.Tensor.cuda, which must not leak into the
rest of the test session.  See the impl module docstring for the full
methodology (random-weight reference SuRF -> convert_checkpoint ->
output comparison at ~1e-4 through train AND val modes).
"""

import os
import subprocess
import sys

import pytest

pytest.importorskip("torch")

pytestmark = pytest.mark.slow

_IMPL = os.path.join(os.path.dirname(__file__), "composite_parity_impl.py")


def test_composite_forward_parity():
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not available")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # impl runs single-device CPU
    res = subprocess.run(
        [sys.executable, _IMPL], capture_output=True, text=True,
        timeout=1200, env=env)
    sys.stdout.write(res.stdout[-4000:])
    sys.stderr.write(res.stderr[-4000:])
    assert res.returncode == 0
    assert "COMPOSITE PARITY OK" in res.stdout
