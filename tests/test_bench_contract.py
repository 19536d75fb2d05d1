"""Driver-contract test for bench.py.

BENCH_r03 was lost to a tunnel wedge; BENCH_r04 must not be lost to a
wiring error.  This runs the WHOLE bench pipeline — parent/child re-exec
orchestration, the primary eval metric, and all three extras (756px cache
build, stage-1 train step, LoRA joint step) — on CPU with a tiny backbone
(UCOD_BENCH_TINY_EXTRAS) and validates the printed JSON contract.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.heavy  # subprocess e2e (~2-4 min on this host)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXTRA_NAMES = (
    "756px feature-cache build",
    "stage-1 train step",
    "LoRA joint train step",
)


def test_bench_json_contract_tiny_cpu():
    env = dict(os.environ)
    env.update(
        UCOD_FORCE_CPU="1", UCOD_BENCH_TINY_EXTRAS="1",
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, r.stdout  # ONE JSON line — the driver contract
    d = json.loads(lines[0])

    # core driver keys
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in d, d
    assert d["unit"] == "img/s" and d["value"] > 0

    # self-certification keys
    assert d["device_kind"] == "cpu" and d["backend"] == "cpu"
    assert d["flops_per_img"] > 1e9
    assert d["peak_bf16_tflops"] is None and d["mfu"] is None  # unknown on cpu

    # extras: each of the three hot paths either reported a number or left
    # an explicit omission note on stderr (absurd-timing guard on a
    # contended host) — NEVER silently absent
    reported = {m["metric"] for m in d["metrics"]}
    for name in EXTRA_NAMES:
        hit = any(name in m for m in reported)
        assert hit or "omitted" in r.stderr, (name, reported, r.stderr[-800:])
    for m in d["metrics"]:
        assert m["value"] > 0 and m["unit"] in ("img/s", "ms/step"), m
