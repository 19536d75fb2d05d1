"""Real multi-process metric gathering: two jax.distributed CPU processes
with ragged per-process image counts must converge to identical global
statistics (the accelerator.gather_for_metrics counterpart)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

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
    outs = [p.communicate(timeout=150)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-800:]
    assert "OK 0 5" in outs[0]
    assert "OK 1 5" in outs[1]
