"""Packaging: pyproject metadata, console entry points, wheel install.

The framework must be consumable as an installed package (``pip install
ucod-dpl-tpu``), not only as a repo checkout with ``sys.path`` bootstrapping
— the reference repo offers scripts only (no packaging at all), so this is
part of the migration surface (README/MIGRATION document both forms).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_pyproject():
    import tomllib

    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve():
    """Every declared console command must import to a callable."""
    import importlib

    proj = _load_pyproject()
    scripts = proj["project"]["scripts"]
    assert set(scripts) == {
        "ucod-train", "ucod-eval", "ucod-lt-train", "ucod-lt-eval",
        "ucod-generate-pseudo-label",
    }
    for name, target in scripts.items():
        mod_name, attr = target.split(":")
        fn = getattr(importlib.import_module(mod_name), attr)
        assert callable(fn), name


def test_version_single_source():
    import ucod_dpl_tpu

    proj = _load_pyproject()
    assert proj["tool"]["setuptools"]["dynamic"]["version"] == {
        "attr": "ucod_dpl_tpu.__version__"
    }
    assert ucod_dpl_tpu.__version__.count(".") == 2


def test_repo_scripts_share_cli_surface():
    """The repo scripts (reference parity layout) must delegate to the same
    functions the console commands use — one CLI surface, two spellings."""
    from scripts.args import parse_args as script_parse_args
    from scripts.common import init_cfg as script_init_cfg
    from ucod_dpl_tpu.cli import init_cfg, parse_args

    assert script_parse_args is parse_args
    assert script_init_cfg is init_cfg


def test_cli_help_does_not_touch_jax():
    """--help must not initialise a backend (arg errors shouldn't pay — or
    wedge on — device discovery).  Runs with -S: this host's sitecustomize
    imports jax into EVERY interpreter, which would mask a cli-side import."""
    code = (
        "import sys\n"
        "sys.path.insert(0, %r)\n"
        "from ucod_dpl_tpu.cli import train_main\n"
        "try:\n"
        "    train_main(['--help'])\n"
        "except SystemExit as e:\n"
        "    assert e.code == 0\n"
        "assert 'jax' not in sys.modules, 'help imported jax'\n"
        "print('HELP-OK')\n" % REPO
    )
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    out = subprocess.run(
        [sys.executable, "-S", "-c", code], capture_output=True, text=True,
        env=env, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "HELP-OK" in out.stdout


@pytest.mark.heavy
def test_wheel_builds_and_imports(tmp_path):
    """Build the wheel offline, install it to an isolated target, and import
    the package + run a console entry point WITHOUT the repo on sys.path."""
    wheel_dir = tmp_path / "wheels"
    build = subprocess.run(
        [
            sys.executable, "-m", "pip", "wheel", REPO,
            "--no-deps", "--no-build-isolation", "-w", str(wheel_dir),
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert build.returncode == 0, build.stderr[-3000:]
    wheels = list(wheel_dir.glob("ucod_dpl_tpu-*.whl"))
    assert len(wheels) == 1, wheels

    target = tmp_path / "site"
    install = subprocess.run(
        [
            sys.executable, "-m", "pip", "install", str(wheels[0]),
            "--no-deps", "--target", str(target),
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert install.returncode == 0, install.stderr[-3000:]
    # the CLI module and the full package tree must ship in the wheel
    assert (target / "ucod_dpl_tpu" / "cli.py").is_file()
    assert (target / "ucod_dpl_tpu" / "ops" / "attention.py").is_file()

    code = (
        "import ucod_dpl_tpu, os\n"
        "assert os.path.realpath(ucod_dpl_tpu.__file__).startswith(%r), ucod_dpl_tpu.__file__\n"
        "from ucod_dpl_tpu.cli import eval_main\n"
        "try:\n"
        "    eval_main(['--help'])\n"
        "except SystemExit as e:\n"
        "    assert e.code == 0\n"
        "print('WHEEL-OK', ucod_dpl_tpu.__version__)\n"
        % str(os.path.realpath(target))
    )
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    env["PYTHONPATH"] = str(target)
    # cwd OUTSIDE the repo: the import must come from the installed wheel
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        cwd=str(tmp_path), timeout=120,
    )
    assert out.returncode == 0, (out.stdout + out.stderr)[-3000:]
    assert "WHEEL-OK" in out.stdout
