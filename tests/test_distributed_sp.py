"""Multi-host SEQUENCE-PARALLEL LoRA training: two jax.distributed CPU
processes (4 virtual devices each) run stage-1 LoRA train steps with the
backbone's ring attention spanning BOTH processes (mesh {data: 2, seq: 4}
over 8 global devices — the ppermute ring crosses the process boundary).

Final adapters AND decoder must be bitwise identical across processes and
match a single-process 8-device run of the same mesh on the same global
batches.  Completes the distributed matrix: DP training across processes
is pinned by test_distributed_lora.py; this pins the SP ring (forward AND
its custom backward ring) across processes — the multi-host scaling mode
for high-resolution fine-tuning.  (Feature EXTRACTION deliberately rejects
process-spanning SP/TP meshes — extraction is per-process work; the train
step is a lock-step global collective, which is exactly what this runs.)
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-process / e2e: excluded from the quick loop

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_BODY = textwrap.dedent(
    '''
    def run_steps():
        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ucod_dpl_tpu.config import CfgNode
        from ucod_dpl_tpu.engine.train_step import (
            TrainState, make_lora_train_step, make_optimizer,
        )
        from ucod_dpl_tpu.models.dba import init_rev_decoder
        from ucod_dpl_tpu.models.dino import DinoConfig, init_dino
        from ucod_dpl_tpu.models.discriminator import init_discriminator
        from ucod_dpl_tpu.models.lora import init_lora
        from ucod_dpl_tpu.parallel import build_mesh

        cfg = CfgNode({
            "model_cfg": {"dim": 64, "feature_size": 8, "ema_weight": 0.99,
                          "dis_use_features": False,
                          "lora": {"enable": True, "rank": 2, "alpha": 4.0,
                                   "lr": 1e-4, "remat": False}},
            "train_cfg": {"merge_method": "dis", "max_epoch": 25,
                          "start_finetune": -5},
        })
        dino_cfg = DinoConfig(
            variant="dinov2", image_size=32, patch_size=8, hidden_size=64,
            num_layers=2, num_heads=2, mlp_ratio=2, use_layerscale=True,
        )
        # the seq axis spans the two processes: each holds 4 devices, the
        # ring is 4 wide x data 2, so k/v chunks ppermute ACROSS processes
        mesh = build_mesh({"data": 2, "seq": 4})
        assert int(np.prod(list(mesh.shape.values()))) == 8, mesh.shape

        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        dec = init_rev_decoder(k1, 64)
        dec_ema = init_rev_decoder(k2, 64)
        dis_params, dis_stats = init_discriminator(
            jax.random.PRNGKey(1), feature_size=8, feature_dim=64,
            use_features=False,
        )
        backbone = init_dino(jax.random.PRNGKey(2), dino_cfg)
        lora = init_lora(jax.random.PRNGKey(3), backbone, rank=2)
        opt = make_optimizer(2e-4, 0.95, 25)
        dis_opt = make_optimizer(1e-3, 0.95, 25)
        lora_opt = make_optimizer(1e-4, 0.95, 25)
        state = TrainState(
            decoder=dec, decoder_ema=dec_ema, opt_state=opt.init(dec),
            dis_params=dis_params, dis_stats=dis_stats,
            dis_opt_state=dis_opt.init(dis_params),
            ema_step=jnp.int32(0),
        )
        lora_opt_state = lora_opt.init(lora)
        step = jax.jit(make_lora_train_step(cfg, opt, lora_opt, dino_cfg,
                                            jnp.float32,
                                            sp_shard=(mesh, "seq")))

        rep = NamedSharding(mesh, P())
        state = jax.device_put(state, rep)
        lora = jax.device_put(lora, rep)
        lora_opt_state = jax.device_put(lora_opt_state, rep)
        backbone = jax.device_put(backbone, rep)

        rng = np.random.default_rng(42)
        for i in range(3):
            px_g = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
            pl_g = (rng.random((8, 10, 10, 1)) > 0.5).astype(np.float32)

            def put(global_np):
                sharding = NamedSharding(mesh, P("data", None, None, None))
                return jax.make_array_from_process_local_data(
                    sharding, global_np[_local_slice(global_np.shape[0])],
                    global_np.shape,
                )

            state, lora, lora_opt_state, aux = step(
                state, lora, lora_opt_state, backbone,
                put(px_g), put(pl_g), jnp.float32(0.0), jnp.float32(1.0),
            )
            assert np.isfinite(float(aux["loss"]))
            assert float(aux["lora_grad_norm"]) > 0.0

        flat = np.concatenate(
            [np.asarray(jax.device_get(x)).ravel() for x in state.decoder]
            + [
                np.asarray(jax.device_get(leaf)).ravel()
                for leaf in jax.tree.leaves(lora)
            ]
        )
        return flat
    '''
)

_WORKER = (
    textwrap.dedent(
        """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
    port, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:" + port, num_processes=2, process_id=pid
    )
    sys.path.insert(0, "__REPO__")

    def _local_slice(global_batch):
        per = global_batch // 2
        return slice(pid * per, (pid + 1) * per)

    __BODY__

    flat = run_steps()
    import numpy as np
    np.save(sys.argv[3] + f"/params_{pid}.npy", flat)
    print("DONE", pid, float(np.abs(flat).sum()))
    """
    )
    .replace("__REPO__", REPO)
    .replace("__BODY__", _BODY)
)

_SINGLE = (
    textwrap.dedent(
        """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "__REPO__")

    def _local_slice(global_batch):
        return slice(0, global_batch)

    __BODY__

    flat = run_steps()
    import numpy as np
    np.save(sys.argv[1] + "/params_single.npy", flat)
    print("DONE single", float(np.abs(flat).sum()))
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


def test_two_process_sp_lora_training_equivalence(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    single = tmp_path / "single.py"
    single.write_text(_SINGLE)
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
        outs = [p.communicate(timeout=420)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    single_proc = subprocess.run(
        [sys.executable, str(single), str(tmp_path)],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert single_proc.returncode == 0, single_proc.stdout[-3000:] + single_proc.stderr[-2000:]

    p0 = np.load(tmp_path / "params_0.npy")
    p1 = np.load(tmp_path / "params_1.npy")
    ps = np.load(tmp_path / "params_single.npy")
    # both processes hold bitwise-identical replicated state
    np.testing.assert_array_equal(p0, p1)
    # and the cross-process ring matches the single-process 8-device run.
    # Tolerance: Adam's update direction divides by sqrt(v)+eps, so a 1e-7
    # collective-transport difference in a near-zero gradient can move a
    # parameter a full lr-sized step — the same bound
    # test_sp.py::test_sp_lora_train_step_matches_unsharded pins (no element
    # may move MORE than ~one Adam step apart; grad math itself is pinned at
    # 1e-5 by the ring-VJP tests).
    np.testing.assert_allclose(p0, ps, rtol=1e-3, atol=4.5e-4)
