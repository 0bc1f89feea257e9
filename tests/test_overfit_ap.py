"""End-to-end detection-quality floor (the in-suite gate README names).

A CPU-budget reduction of tools/overfit_ap.py: overfit PointPillars on
a generated mini-KITTI tree and demand official-eval 3d AP >= 55
through the FULL chain — prep -> training -> checkpoint -> flat-pillar
eval -> lidar->camera conversion -> the official 41-point KITTI AP
(reference second/utils/eval.py:730 semantics).  Loss-only tests
(test_training.py) cannot catch a detector that converges to wrong
boxes; this one fails if detection quality regresses anywhere in the
chain.

Runs the tool in a SUBPROCESS pinned to ONE virtual CPU device: the
suite's 8-device mesh would multiply the per-step batch (and the
single-core step cost) by 8 for no extra signal here.

Fixture notes: 8 frames x 8 cars = 64 GT clears the official metric's
>= 41-GT floor (see tools/overfit_ap.py docstring).  The on-chip
full-strength run (1000 steps) reaches 3d AP ~87-89 (OVERFIT_AP.json);
the reduced step count trades margin for CPU budget.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_overfit_ap_floor(tmp_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    # the axon plugin registers itself at interpreter start when this
    # var is present and then ignores JAX_PLATFORMS (see verify skill)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO), str(REPO / "tests"), env.get("PYTHONPATH", "")])
    json_path = tmp_path / "overfit_ap.json"
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "overfit_ap.py"),
         "--steps", "250", "--frames", "8",
         "--out", str(tmp_path / "work"), "--json", str(json_path)],
        env=env, capture_output=True, text=True, timeout=2100)
    assert json_path.exists(), (
        f"overfit tool produced no result\nstdout: {proc.stdout[-2000:]}\n"
        f"stderr: {proc.stderr[-2000:]}")
    res = json.loads(json_path.read_text())
    assert res["3d"] >= 55.0, (
        f"overfit 3d AP {res['3d']:.2f} < 55 — detection quality "
        f"regressed somewhere between prep and the official eval: {res}")
    assert res["bev"] >= 55.0, res
