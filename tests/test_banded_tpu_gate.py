"""On-chip banded-kernel parity gate (TPU-only; skipped on CPU hosts).

The suite's conftest pins every in-process test to a virtual 8-device
CPU mesh, where banded_conv runs the Pallas kernel in INTERPRET mode —
the same kernel code, but not the Mosaic compilation. This test runs
tools/check_banded_tpu.py in a clean subprocess (no platform pinning)
so the REAL compiled kernel is compared against the interpret path
(forward + both gradients) whenever a TPU is attached; without one it
skips rather than silently passing.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "check_banded_tpu.py")


def _clean_env():
    env = dict(os.environ)
    # undo the conftest's CPU pinning for the child process
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    return env


def test_compiled_kernel_matches_interpret_on_tpu():
    proc = subprocess.run(
        [sys.executable, TOOL], env=_clean_env(),
        capture_output=True, text=True, timeout=1740)
    out = proc.stdout + proc.stderr
    if "no TPU" in out:
        pytest.skip("no TPU attached — interpret mode is covered in-suite")
    assert proc.returncode == 0 and "PASS" in out, (
        f"compiled banded kernel diverges from interpret path:\n{out}")
