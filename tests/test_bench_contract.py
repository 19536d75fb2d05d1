"""Driver-contract test for bench.py.

BENCH_r03 was lost to a tunnel wedge; BENCH_r04 must not be lost to a
wiring error.  This runs the WHOLE bench pipeline — parent/child re-exec
orchestration, the primary eval metric, and all four extras (756px cache
build, stage-1 train step, LoRA joint step, int8 serving eval) — on CPU
with a tiny backbone (UCOD_BENCH_TINY_EXTRAS) and validates the printed
JSON contract, plus the wedge-failure record the parent emits when the
tunnel is unusable.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EXTRA_NAMES = (
    "756px feature-cache build",
    "stage-1 train step",
    "LoRA joint train step",
    "int8 W8A8 backbone",
    "int8 raw matmul chain",
)


def test_peak_tflops_table():
    """device_kind -> bf16 peak mapping (substring match must not confuse
    generations: 'TPU v5 lite' is a 197-TFLOP v5e, not a 459-TFLOP v5p)."""
    from bench import _peak_bf16_tflops

    assert _peak_bf16_tflops("TPU v5 lite") == 197.0
    assert _peak_bf16_tflops("TPU v5p") == 459.0
    assert _peak_bf16_tflops("TPU v4") == 275.0
    assert _peak_bf16_tflops("TPU v3") == 61.4  # per-core device
    assert _peak_bf16_tflops("TPU v6 lite") == 918.0
    assert _peak_bf16_tflops("Quantum Chip 9000") is None

    from bench import _peak_int8_tops

    assert _peak_int8_tops("TPU v5 lite") == 394.0  # 2x bf16
    assert _peak_int8_tops("TPU v5p") == 918.0
    assert _peak_int8_tops("TPU v4") == 275.0  # int8 at the bf16 rate
    assert _peak_int8_tops("TPU v3") is None  # no int8 MXU mode


def test_analytic_flops_key_fold_discount():
    """The key-folded last layer must be counted as LN1 + a 768->128 matmul,
    not a full transformer layer (an 8.2% MFU inflation otherwise)."""
    from bench import _analytic_backbone_flops_per_img

    from ucod_dpl_tpu.models.dino import DinoConfig

    cfg = DinoConfig.dinov2_base()
    n = (518 // cfg.patch_size) ** 2 + 1
    d = cfg.hidden_size
    full = _analytic_backbone_flops_per_img(cfg, 518)
    folded = _analytic_backbone_flops_per_img(cfg, 518, key_fold_dim=128)
    per_layer = 24 * n * d * d + 4 * n * n * d
    assert abs((full - folded) - (per_layer - 2 * n * d * 128)) < 1.0
    # magnitude sanity: ViT-B@518 is ~0.3 TFLOP/img
    assert 2.5e11 < folded < full < 3.5e11


def test_bench_wedge_failure_emits_machine_readable_line(monkeypatch, capsys):
    """When every attempt hits the discovery watchdog (persistent tunnel
    wedge), the parent must still print ONE JSON line — value=null, an
    explicit error, and the last driver-verified number — so the round's
    BENCH artifact records context instead of only a traceback.  The exit
    code stays nonzero (this is an environment failure, not a measurement)."""
    import bench

    class FakeWedgedChild:
        """A child that immediately exits 3 (discovery-watchdog path)."""

        returncode = 3

        def poll(self):
            return 3

        def communicate(self, timeout=None):
            return ("", None)

    monkeypatch.setattr(bench.subprocess, "Popen", lambda *a, **k: FakeWedgedChild())
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)  # skip backoffs
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    monkeypatch.delenv("UCOD_BENCH_NO_RETRY", raising=False)

    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 3

    out = capsys.readouterr().out
    lines = [l for l in out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out  # ONE JSON line — the driver contract
    d = json.loads(lines[0])
    assert d["value"] is None and d["vs_baseline"] is None
    assert "wedged" in d["error"]
    lv = d["last_verified_on_chip"]
    # provenance is read from the newest successful BENCH_r*.json artifact
    # (not a hardcoded constant that would go stale after each round)
    assert lv["artifact"].startswith("BENCH_r") and lv["value"] > 0
    assert d["unit"] == "img/s"


def test_last_verified_reads_newest_successful_artifact(tmp_path):
    """Highest round with rc==0 and a parsed value wins; rc!=0 rounds and
    malformed files are skipped; an empty dir falls back to the r02
    constant."""
    from bench import _last_verified_on_chip

    assert _last_verified_on_chip(str(tmp_path))["value"] == 515.39  # fallback

    (tmp_path / "BENCH_r02.json").write_text(json.dumps(
        {"n": 2, "rc": 0,
         "parsed": {"value": 515.39, "unit": "img/s", "vs_baseline": 5.154}}))
    (tmp_path / "BENCH_r04.json").write_text(json.dumps(
        {"n": 4, "rc": 0,
         "parsed": {"value": 560.5, "unit": "img/s", "vs_baseline": 5.605}}))
    (tmp_path / "BENCH_r05.json").write_text(json.dumps(
        {"n": 5, "rc": 3, "parsed": None}))  # wedged round must not win
    (tmp_path / "BENCH_r06.json").write_text("not json")
    lv = _last_verified_on_chip(str(tmp_path))
    assert lv == {"artifact": "BENCH_r04.json", "value": 560.5,
                  "unit": "img/s", "vs_baseline": 5.605}


def test_bench_measurement_phase_kill_emits_machine_readable_line(
    monkeypatch, capsys
):
    """A wedge AFTER discovery (child killed in the measurement phase, no
    retry — a post-discovery kill can itself create a stale claim) must
    also emit the value=null JSON record, not just a stderr note."""
    import subprocess as sp

    import bench

    class FakeHungChild:
        """Touches the discovery sentinel, then never exits."""

        returncode = None

        def __init__(self, env):
            self._env = env

        def poll(self):
            # parent polls during the discovery wait; create the sentinel
            # on first poll so it moves on to the measurement phase
            open(self._env["UCOD_BENCH_DISCOVERY_SENTINEL"], "w").write("ok")
            return None

        def communicate(self, timeout=None):
            raise sp.TimeoutExpired(cmd="bench-child", timeout=timeout)

        def kill(self):
            pass

        def wait(self):
            self.returncode = -9

    monkeypatch.setattr(
        bench.subprocess, "Popen", lambda *a, env=None, **k: FakeHungChild(env)
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "POST_DISCOVERY_BUDGET_S", 0.01)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    monkeypatch.delenv("UCOD_BENCH_NO_RETRY", raising=False)

    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 3

    out = capsys.readouterr().out
    lines = [l for l in out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out
    d = json.loads(lines[0])
    assert d["value"] is None
    assert "post-discovery" in d["error"]
    assert d["last_verified_on_chip"]["value"] > 0


@pytest.mark.heavy  # subprocess e2e (~1-2 min on this host)
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
    # a tiny smoke must be self-identifying so its numbers can never be
    # recorded as the round's perf artifact
    assert d["tiny_smoke"] is True
    assert d["metric"].startswith("[TINY SMOKE")
    assert all(m["metric"].startswith("[TINY SMOKE]") for m in d["metrics"])

    # self-certification keys
    assert d["device_kind"] == "cpu" and d["backend"] == "cpu"
    assert d["flops_per_img"] > 1e9
    assert d["peak_bf16_tflops"] is None and d["mfu"] is None  # unknown on cpu

    # extras: each hot path either reported a number or left an explicit
    # PER-EXTRA omission record — MACHINE-VISIBLE in the JSON itself
    # ("omitted_extras"), not stderr-only (ADVICE r4) — NEVER silently
    # absent.  The omission match is name-specific: a generic "omitted"
    # test would let one legitimately omitted extra mask a different extra
    # silently vanishing.
    assert isinstance(d["omitted_extras"], list)
    reported = {m["metric"] for m in d["metrics"]}
    omitted_names = [o["metric"] for o in d["omitted_extras"]]
    for name in EXTRA_NAMES:
        hit = any(name in m for m in reported)
        omitted = any(name in o for o in omitted_names)
        assert hit or omitted, (name, reported, d["omitted_extras"])
        if omitted:  # stderr note still present for humans watching a run
            assert f"extra omitted [{name}]" in r.stderr
    for m in d["metrics"]:
        assert m["value"] > 0 and m["unit"] in ("img/s", "ms/step", "x speedup"), m
    for o in d["omitted_extras"]:
        assert o["reason"], o
