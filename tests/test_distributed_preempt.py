"""Multi-process preemption coordination (round 7).

The platform delivers SIGTERM to each process independently, so local
preemption flags RACE batch boundaries: without coordination, the rank
that saw the signal first would enter the collective checkpoint save one
step behind the others (mixed-step orbax shards — silent corruption) or
exit and strand the other ranks in the next train step's gradient psum.
``preempt.requested_global`` makes every safe boundary a cluster-agreed
decision (allgather-max of the local flags).

This test injects the flag on RANK 0 ONLY, mid-epoch, in a 2-process run:

  * BOTH ranks must exit through the preemption path (128+SIGTERM) at the
    SAME batch boundary, writing one coherent orbax checkpoint;
  * resuming that checkpoint in a fresh 2-process run must finish bitwise
    equal to an uninterrupted 2-process control run.
"""

import pytest

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

pytestmark = pytest.mark.heavy  # multi-process / e2e: excluded from the quick loop

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    '''
    import os, signal, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
    port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:" + port, num_processes=2, process_id=pid
    )
    sys.path.insert(0, "__REPO__")

    import json

    import numpy as np

    from ucod_dpl_tpu.config import CfgNode
    from ucod_dpl_tpu.engine import preempt
    from ucod_dpl_tpu.engine.train_loop import TrainLoop
    from ucod_dpl_tpu.models.dba import init_rev_decoder
    from ucod_dpl_tpu.models.discriminator import init_discriminator
    from ucod_dpl_tpu.parallel import build_mesh
    from ucod_dpl_tpu.parallel.distributed import barrier

    assert jax.process_count() == 2 and len(jax.devices()) == 8

    DIM, FS, NB, B = 32, 8, 4, 8  # global batch 8 over the 8-device data axis

    def make_cfg(resume=None):
        d = {
            "model_cfg": {"dim": DIM, "feature_size": FS, "ema_weight": 0.99,
                          "dis_use_features": False},
            "train_cfg": {
                "max_epoch": 2, "start_finetune": -1, "merge_method": "dis",
                "dis_intertrain": 2, "dis_epoch": 1, "start_epoch": 0,
                "lr0": 2e-4, "dis_lr0": 1e-3,
                "step_lr_size": 25, "step_lr_gamma": 0.95,
                # coordinate at EVERY batch so the injected flag is honored
                # at exactly batch 3 (the production default of 16 bounds
                # the per-batch allgather cost; the mechanism is identical)
                "preempt_poll_interval": 1,
                "save_cfg": {"start_save": 10_000, "save_interval": 5,
                             "save_mode": "all", "backend": "orbax"},
            },
            "val_cfg": {"enable_val": False, "val_interval": 5, "start_val": 10_000},
            "log_cfg": {"log_interval": 1_000},
        }
        if resume:
            d["train_cfg"]["resume"] = resume
        return CfgNode(d)

    class Loader:
        """Deterministic identical GLOBAL batches on every rank (epoch-keyed),
        with the set_epoch/skip_batches resume surface."""

        def __init__(self):
            self._epoch = 0
            self._skip = 0

        def set_epoch(self, e):
            self._epoch = e

        def skip_batches(self, n):
            self._skip = n

        def __iter__(self):
            s, self._skip = self._skip, 0
            rng = np.random.default_rng(1000 + self._epoch)
            batches = []
            for _ in range(NB):
                batches.append({
                    "features": rng.standard_normal((B, 6, 6, DIM)).astype(np.float32),
                    "pseudo_label": (rng.random((B, FS * 2, FS * 2, 1)) > 0.5)
                        .astype(np.float32),
                })
            return iter(batches[s:])

        def __len__(self):
            return NB

    class Logger:
        def log(self, *a, **k):
            pass

        def log_table(self, *a, **k):
            pass

    class Runner:
        def __init__(self, ckp_dir):
            import jax as _j

            self.mesh = build_mesh({"data": -1, "model": 1})
            k1, k2, k3 = _j.random.split(_j.random.PRNGKey(0), 3)
            self.decoder_params = init_rev_decoder(k1, DIM)
            self.decoder_ema_params = init_rev_decoder(k2, DIM)
            p, s = init_discriminator(
                k3, feature_size=FS, feature_dim=DIM, use_features=False
            )
            self.discriminator_params = p
            self.discriminator_stats = s
            self.train_dataloader = Loader()
            self.ckp_dir = ckp_dir
            self.logger = Logger()

        def save_checkpoint(self, epoch):
            raise AssertionError("boundary model saves disabled in this fixture")

        def launch_val_look_twice(self):
            raise AssertionError("validation disabled in this fixture")

    def fingerprint(loop):
        return np.concatenate([
            np.asarray(jax.device_get(x)).ravel()
            for tree in (loop.state.decoder, loop.state.decoder_ema,
                         loop.state.dis_params)
            for x in jax.tree.leaves(tree)
        ])

    # ---- phase A: preempted run (flag injected on rank 0 ONLY) -----------
    ckp_a = os.path.join(outdir, "a")
    os.makedirs(ckp_a, exist_ok=True)
    loop = TrainLoop(make_cfg(), Runner(ckp_a))
    orig = loop._train_step
    calls = {"n": 0}

    def wrapped(*a, **k):
        out = orig(*a, **k)
        calls["n"] += 1
        if calls["n"] == 3 and pid == 0:  # mid-epoch-0, rank 0 only
            preempt._signum = signal.SIGTERM
        return out

    loop._train_step = wrapped
    code = None
    try:
        loop.run()
    except SystemExit as e:
        code = e.code
    assert code == 128 + signal.SIGTERM, (pid, code)
    preempt.clear()

    state_path = os.path.join(ckp_a, "state_preempt")
    barrier("after-preempt-save")
    with open(state_path + ".json") as f:
        meta = json.load(f)
    # BOTH ranks (rank 1 never had a local flag) stopped at the SAME
    # boundary: train phase, 3 batches applied, epoch 0
    assert meta["phase"] == "train" and meta["batch_done"] == 3, meta
    assert meta["epoch"] == 0, meta

    # ---- phase B: resume in a fresh loop, run to completion --------------
    loop_b = TrainLoop(make_cfg(resume=state_path), Runner(ckp_a))
    loop_b.run()
    fp_resumed = fingerprint(loop_b)

    # ---- phase C: uninterrupted control -----------------------------------
    preempt.clear()
    ckp_c = os.path.join(outdir, "c")
    os.makedirs(ckp_c, exist_ok=True)
    loop_c = TrainLoop(make_cfg(), Runner(ckp_c))
    loop_c.run()
    fp_control = fingerprint(loop_c)

    np.testing.assert_array_equal(fp_resumed, fp_control)
    np.save(os.path.join(outdir, f"fp_{pid}.npy"), fp_resumed)
    print("DONE", pid, float(np.abs(fp_resumed).sum()))
    '''
).replace("__REPO__", REPO)


_EVAL_WORKER = textwrap.dedent(
    '''
    import os, signal, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
    port, pid, root = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:" + port, num_processes=2, process_id=pid
    )
    sys.path.insert(0, "__REPO__")
    sys.path.insert(0, "__REPO__/tests")

    import numpy as np

    from test_eval_e2e import _make_synthetic_dataset, _tiny_cfg
    from ucod_dpl_tpu.engine import Runner, preempt
    from ucod_dpl_tpu.parallel.distributed import barrier

    from pathlib import Path

    if pid == 0:
        _make_synthetic_dataset(Path(root) / "RefCOD", n=5)
    barrier("dataset-ready")
    cfg = _tiny_cfg(Path(root))
    cfg.log_cfg.multi_rank = [0, 1]
    cfg.val_cfg.metric_workers = 0  # keep the scorer in-process per rank
    runner = Runner(cfg, mode="eval")

    # the flag exists on RANK 0 ONLY; rank 1 must learn of it through
    # GlobalPoll's collective schedule and raise at the same round —
    # otherwise rank 1 would run to the final metric allgather and hang
    preempt.install()
    if pid == 0:
        preempt._signum = signal.SIGTERM
    got = None
    try:
        runner.launch_val_look_twice()
    except preempt.Preempted as e:
        got = e.signum
    assert got == signal.SIGTERM, (pid, got)
    print("PREEMPTED-TOGETHER", pid)
    '''
).replace("__REPO__", REPO)


def test_eval_globalpoll_raises_on_both_ranks(tmp_path):
    """A mid-eval preemption flag on one rank must surface as Preempted on
    EVERY rank (preempt.GlobalPoll) — not strand the flagless rank in the
    final metric allgather until the platform SIGKILLs the pod."""
    worker = tmp_path / "eval_worker.py"
    worker.write_text(_EVAL_WORKER)
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
        assert "PREEMPTED-TOGETHER" in out


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_one_rank_flag_coordinates_both_ranks(tmp_path):
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
        # a hung rank (the exact bug class this test guards) must not leak
        # workers that hold the coordinator port for the rest of the session
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2500:]

    # one SPMD program: the ranks' resumed trajectories are bitwise equal
    fp0 = np.load(tmp_path / "fp_0.npy")
    fp1 = np.load(tmp_path / "fp_1.npy")
    np.testing.assert_array_equal(fp0, fp1)
    assert np.abs(fp0).sum() > 0
