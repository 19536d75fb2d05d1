"""Real multi-process metric gathering: two jax.distributed CPU processes
with ragged per-process image counts must converge to identical global
statistics (the accelerator.gather_for_metrics counterpart)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.heavy  # multi-process / e2e: excluded from the quick loop

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    port, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:" + port, num_processes=2, process_id=pid
    )
    sys.path.insert(0, "__REPO__")
    import numpy as np
    from ucod_dpl_tpu.utils.metrics import CODStatistics

    stats = CODStatistics()
    rng = np.random.default_rng(pid)
    for _ in range(2 + pid):  # ragged shard sizes
        gt = (rng.random((24, 24)) > 0.5).astype(float)
        stats.step(gt[None], gt[None])
    stats.sync_across_processes()
    res = stats.get_result()
    assert len(stats._mae) == 5, len(stats._mae)
    assert res["MAE"] == 0.0
    print("OK", pid, len(stats._mae))
    """
).replace("__REPO__", REPO)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_metric_gather(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), port, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    try:
        outs = [p.communicate(timeout=150)[0] for p in procs]
    finally:
        for p in procs:  # never leak hung workers into the session
            if p.poll() is None:
                p.kill()
                p.wait()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-800:]
    assert "OK 0 5" in outs[0]
    assert "OK 1 5" in outs[1]


_BOOTSTRAP_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    port, pid = sys.argv[1], int(sys.argv[2])
    # the env-var launch contract maybe_initialize_distributed serves:
    os.environ["JAX_COORDINATOR_ADDRESS"] = "127.0.0.1:" + port
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)
    sys.path.insert(0, "__REPO__")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from ucod_dpl_tpu.parallel.distributed import (
        maybe_initialize_distributed, is_main_process, barrier,
    )
    # must NOT touch the backend before initialize — a process_count()
    # probe inside would make this raise
    maybe_initialize_distributed()
    maybe_initialize_distributed()  # idempotent
    assert jax.process_count() == 2, jax.process_count()
    assert is_main_process() == (pid == 0)
    barrier("bootstrap")
    print("OK", pid)
    """
).replace("__REPO__", REPO)


def test_maybe_initialize_distributed_bootstraps_two_processes(tmp_path):
    """The env-var bootstrap path must actually initialize the process
    group (regression: a jax.process_count() probe before initialize()
    spun up the backend and made initialize() always raise)."""
    worker = tmp_path / "boot.py"
    worker.write_text(_BOOTSTRAP_WORKER)
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), port, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    try:
        outs = [p.communicate(timeout=180)[0] for p in procs]
    finally:
        for p in procs:  # never leak hung workers into the session
            if p.poll() is None:
                p.kill()
                p.wait()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-1500:]
        assert "OK" in out


def test_shard_batch_replicates_scalar_leaves():
    """Batch pytrees may carry scalar leaves (step counters, loss weights);
    sharding must replicate them instead of crashing on P('data') rank-0."""
    import numpy as np

    import jax
    from ucod_dpl_tpu.parallel import build_mesh
    from ucod_dpl_tpu.parallel.mesh import shard_batch

    mesh = build_mesh({"data": -1, "model": 1}, devices=jax.devices())
    batch = {
        "x": np.zeros((8, 3), np.float32),
        "step": np.float32(1.0),
        "flag": np.asarray(True),
    }
    out = shard_batch(batch, mesh)
    assert float(out["step"]) == 1.0
    assert out["x"].shape == (8, 3)


def test_gather_object_lists_single_process_identity():
    from ucod_dpl_tpu.parallel.distributed import gather_object_lists

    import numpy as np

    local = [np.ones((2, 2)), np.zeros((2, 2))]
    assert gather_object_lists(local) is local
    assert gather_object_lists([]) == []
