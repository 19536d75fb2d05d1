"""Two-process Runner-path eval: the FULL product surface multi-process.

Covers what the metric-gather and train-step tests do not: Runner
construction on two jax.distributed processes with a SHARED cache
directory (process 0 builds the feature cache, process 1 waits at the
barrier and re-opens read-only — without that coordination every pod
process redundantly sweeps the backbone and races on the same cache
files), process-sharded val dataloaders, the LookTwice evaluator with the
cross-process stats sync, and the final metric dict — which must be
IDENTICAL on both processes and equal to a single-process run over the
same data.
"""

import pytest

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

pytestmark = pytest.mark.heavy  # multi-process / e2e: excluded from the quick loop

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_BODY = textwrap.dedent(
    '''
    import numpy as np

    from ucod_dpl_tpu.config import CfgNode
    from ucod_dpl_tpu.engine import Runner


    def tiny_cfg(root):
        return CfgNode({
            "work_dir": root + "/work",
            "mode": "eval",
            "seed": 42,
            "model_cfg": {"dim": 64, "feature_size": 8,
                          "dis_use_features": False, "ema_weight": 0.99},
            "val_cfg": {"look_twice": True, "look_twice_th": 0.95,
                        "expand_type": "dynamic", "enable_val": True,
                        "metric_workers": 0},
            "log_cfg": {"log_path": root + "/logs", "multi_rank": [0, 1]},
            "tpu_cfg": {"mesh": {"data": -1, "model": 1}},
            "dataset_cfg": {
                "dataset_dir": root + "/RefCOD",
                "cache_dir": root + "/cache",
                "valset_cfg": {"DATASET": "TINY", "require_label": True,
                                "image_size": (56, 56), "keep_size": True},
                "trainset_cfg": {"DATASET": "TINY", "require_label": False,
                                  "image_size": (56, 56), "bkg_th": 0.6},
                "val_loader_cfg": {"batch_size": 1},
                "trainloader_cfg": {"batch_size": 2, "shuffle": True},
                "feature_extractor_cfg": {
                    "type": "dinov2",
                    "backbone": "facebook/dinov2-base",
                    "backbone_weights": root + "/nonexistent",
                    "arch": {"hidden_size": 64, "num_layers": 2,
                              "num_heads": 4, "patch_size": 14,
                              "image_size": 56},
                },
            },
        })


    def run_eval(root):
        cfg = tiny_cfg(root)
        runner = Runner(cfg, mode="eval")
        return runner.launch_val_look_twice()
    '''
)

_WORKER = (
    textwrap.dedent(
        """
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
    port, pid, root = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:" + port, num_processes=2, process_id=pid
    )
    sys.path.insert(0, "__REPO__")

    __BODY__

    result = run_eval(root)
    with open(os.path.join(root, f"result_{pid}.json"), "w") as f:
        json.dump(result, f)
    print("DONE", pid)
    """
    )
    .replace("__REPO__", REPO)
    .replace("__BODY__", _BODY)
)

_SINGLE = (
    textwrap.dedent(
        """
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
    root = sys.argv[1]
    sys.path.insert(0, "__REPO__")

    __BODY__

    result = run_eval(root)
    with open(os.path.join(root, "result_single.json"), "w") as f:
        json.dump(result, f)
    print("DONE single")
    """
    )
    .replace("__REPO__", REPO)
    .replace("__BODY__", _BODY)
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_runner_eval(tmp_path):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_pipeline_harness import make_synthetic_dataset

    make_synthetic_dataset(str(tmp_path / "RefCOD" / "TINY"), n=5)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), port, str(pid), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    try:
        outs = [p.communicate(timeout=600)[0] for p in procs]
    finally:
        for p in procs:  # never leak hung workers into the session
            if p.poll() is None:
                p.kill()
                p.wait()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2500:]

    with open(tmp_path / "result_0.json") as f:
        r0 = json.load(f)
    with open(tmp_path / "result_1.json") as f:
        r1 = json.load(f)
    # the gathered statistics make every process report the same metrics
    assert r0 == r1, (r0, r1)

    # the feature cache was built exactly once (by process 0) and read by
    # process 1 — no duplicate/raced writes
    feat_dir = tmp_path / "cache" / "features_cache" / "dinov2" / "test" / "TINY"
    assert (feat_dir / "index.json").exists()

    # and the distributed result equals a single-process run on the same
    # data (cache reused read-only; same virtual device count so the eval
    # programs match)
    single = tmp_path / "single.py"
    single.write_text(_SINGLE)
    r = subprocess.run(
        [sys.executable, str(single), str(tmp_path)],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    with open(tmp_path / "result_single.json") as f:
        rs = json.load(f)
    for key in rs:
        assert np.isclose(r0[key], rs[key], atol=1e-12), (key, r0[key], rs[key])
