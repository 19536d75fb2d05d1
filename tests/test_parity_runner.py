"""Plumbing test for scripts/parity.py: synthetic data + the SHIPPED
reference decoder checkpoint + random backbone.  Verifies the runner
produces a structured report with published-vs-ours deltas and a failing
exit code when numbers (obviously) don't match.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from conftest import reference_available

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIPPED = "/root/reference/weights/UCOD_DPL_dinov2.safetensors"

pytestmark = pytest.mark.skipif(
    not (reference_available() and os.path.exists(SHIPPED)),
    reason="shipped reference checkpoint not available",
)


def _synth(root, dataset="CHAMELEON", n=2):
    im = os.path.join(root, dataset, "im")
    gt = os.path.join(root, dataset, "gt")
    os.makedirs(im)
    os.makedirs(gt)
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray((rng.random((64, 80, 3)) * 255).astype(np.uint8)).save(
            os.path.join(im, f"x{i}.jpg")
        )
        m = np.zeros((64, 80), np.uint8)
        m[20:40, 20:50] = 255
        Image.fromarray(m).save(os.path.join(gt, f"x{i}.png"))


def test_parity_runner_plumbing(tmp_path):
    _synth(str(tmp_path / "RefCOD"))
    report_path = str(tmp_path / "report.json")
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    env["UCOD_FORCE_CPU"] = "1"
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "parity.py"),
            "--data-dir", str(tmp_path / "RefCOD"),
            "--cache-dir", str(tmp_path / "cache"),
            "--work-dir", str(tmp_path / "work"),
            "--decoder-v2", SHIPPED,
            "--datasets", "CHAMELEON",
            "--allow-random-backbone",
            "--report", report_path,
            # shrink the backbone so the CPU run stays fast
        ],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert os.path.exists(report_path), r.stdout[-2000:] + r.stderr[-2000:]
    report = json.load(open(report_path))
    assert len(report) == 1
    row = report[0]
    assert row["stage"] == "UCOD-DPL" and row["dataset"] == "CHAMELEON"
    assert set(row["ours"]) == {"SMeasure", "WFM", "F_MEAN", "E_MEAN", "MAE"}
    assert row["published"]["SMeasure"] == 0.864
    assert "delta" in row and row["pass"] in (True, False)
    # random backbone cannot reproduce the published table
    assert r.returncode == (0 if row["pass"] else 1)


def test_parity_runner_strict_refuses_random(tmp_path):
    """Without --allow-random-backbone, missing weights must abort loudly."""
    _synth(str(tmp_path / "RefCOD"))
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    env["UCOD_FORCE_CPU"] = "1"
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "parity.py"),
            "--data-dir", str(tmp_path / "RefCOD"),
            "--cache-dir", str(tmp_path / "cache2"),
            "--work-dir", str(tmp_path / "work2"),
            "--decoder-v2", SHIPPED,
            "--datasets", "CHAMELEON",
            "--backbone-weights", str(tmp_path / "nonexistent"),
        ],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode != 0
    assert "strict weight loading" in (r.stdout + r.stderr)
