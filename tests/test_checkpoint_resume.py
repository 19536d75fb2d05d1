"""Full train-state checkpoint/resume: bit-exact state restoration and
training continuation equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ucod_dpl_tpu.engine.checkpoint import load_train_state, save_train_state
from ucod_dpl_tpu.engine.train_step import make_optimizer, make_train_step

from test_train import DIM, _batch, _init_state, _train_cfg


@pytest.mark.heavy  # oracle/e2e composition: full gate only (quick-loop rebalance, round 11)
def test_state_roundtrip_bit_exact(tmp_path):
    cfg = _train_cfg()
    optimizer = make_optimizer(2e-4, 0.95, 25)
    dis_optimizer = make_optimizer(1e-3, 0.95, 25)
    step = jax.jit(make_train_step(cfg, optimizer))
    state = _init_state(cfg, optimizer, dis_optimizer)
    f, pl = _batch()
    state, _ = step(state, f, pl, jnp.float32(0.0), jnp.float32(1.0))

    path = str(tmp_path / "ckpt")
    save_train_state(path, state, {"epoch": 3, "finetune": False})
    template = _init_state(cfg, optimizer, dis_optimizer, seed=99)
    restored, meta = load_train_state(path, template)
    assert meta["epoch"] == 3

    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_identically(tmp_path):
    """Train 4 steps straight vs 2 steps + save/load + 2 steps."""
    cfg = _train_cfg()
    optimizer = make_optimizer(2e-4, 0.95, 25)
    dis_optimizer = make_optimizer(1e-3, 0.95, 25)
    step = jax.jit(make_train_step(cfg, optimizer))
    f, pl = _batch(seed=11)

    s_straight = _init_state(cfg, optimizer, dis_optimizer, seed=5)
    for _ in range(4):
        s_straight, _ = step(s_straight, f, pl, jnp.float32(0.0), jnp.float32(1.0))

    s_a = _init_state(cfg, optimizer, dis_optimizer, seed=5)
    for _ in range(2):
        s_a, _ = step(s_a, f, pl, jnp.float32(0.0), jnp.float32(1.0))
    path = str(tmp_path / "mid")
    save_train_state(path, s_a, {"epoch": 0})
    s_b, _ = load_train_state(path, _init_state(cfg, optimizer, dis_optimizer, seed=77))
    for _ in range(2):
        s_b, _ = step(s_b, f, pl, jnp.float32(0.0), jnp.float32(1.0))

    np.testing.assert_allclose(
        np.asarray(s_straight.decoder.decoupling_w),
        np.asarray(s_b.decoder.decoupling_w),
        rtol=1e-6,
        atol=1e-8,
    )
    assert int(s_straight.ema_step) == int(s_b.ema_step)


def test_orbax_backend_roundtrip(tmp_path):
    """save_train_state(backend='orbax') + auto-detected load restore a
    NamedTuple train state bitwise (the multi-host-capable backend)."""
    import jax.numpy as jnp

    from ucod_dpl_tpu.engine.checkpoint import load_train_state, save_train_state
    from ucod_dpl_tpu.engine.train_step import TrainState
    from ucod_dpl_tpu.models.dba import init_rev_decoder
    from ucod_dpl_tpu.models.discriminator import init_discriminator

    import jax

    dec = init_rev_decoder(jax.random.PRNGKey(0), 32)
    ema = init_rev_decoder(jax.random.PRNGKey(1), 32)
    dis_p, dis_s = init_discriminator(
        jax.random.PRNGKey(2), feature_size=8, feature_dim=32, use_features=False
    )
    state = TrainState(
        decoder=dec, decoder_ema=ema, opt_state={"m": jnp.ones((3,))},
        dis_params=dis_p, dis_stats=dis_s, dis_opt_state={"v": jnp.zeros((2,))},
        ema_step=jnp.int32(5),
    )
    path = str(tmp_path / "state")
    save_train_state(path, state, {"epoch": 3, "finetune": True}, backend="orbax")
    template = jax.tree.map(jnp.zeros_like, state)
    restored, meta = load_train_state(path, template)
    assert meta == {"epoch": 3, "finetune": True}
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_save_is_atomic_and_meta_embedded(tmp_path):
    """The preemption path overwrites a fixed path on every signal; a crash
    mid-save must never destroy the previous good checkpoint, and the
    metadata must commit in the SAME os.replace as the state (a stale
    sidecar .json would replay already-applied batches on resume)."""
    import json
    import os

    cfg = _train_cfg()
    optimizer = make_optimizer(2e-4, 0.95, 25)
    dis_optimizer = make_optimizer(1e-3, 0.95, 25)
    state = _init_state(cfg, optimizer, dis_optimizer, seed=1)
    path = str(tmp_path / "state")
    save_train_state(path, state, {"epoch": 3, "batch_done": 2})
    # no stray temp files left behind
    assert [f for f in os.listdir(tmp_path) if ".tmp." in f] == []
    # desynchronise the sidecar (simulates a crash between an older save's
    # replace and its json write): the embedded copy must win
    with open(path + ".json", "w") as f:
        json.dump({"epoch": 999}, f)
    _, meta = load_train_state(path, state)
    assert meta["epoch"] == 3 and meta["batch_done"] == 2
    # and with the sidecar deleted entirely the load still works
    os.unlink(path + ".json")
    _, meta = load_train_state(path, state)
    assert meta["epoch"] == 3


def test_refiner_loader_rejects_partial_checkpoint(tmp_path):
    """A truncated/wrong safetensors passed via --refiner_path must fail at
    load time with a clear message, not as an opaque KeyError inside the
    jitted refiner trace."""
    import pytest
    from safetensors.numpy import save_file

    from ucod_dpl_tpu.models.udlr import load_refiner_checkpoint

    p = str(tmp_path / "bad.safetensors")
    save_file({"ASR.qkv.weight": np.zeros((3, 3), np.float32)}, p)
    with pytest.raises(ValueError, match="missing"):
        load_refiner_checkpoint(p)


@pytest.mark.heavy  # oracle/e2e composition: full gate only (quick-loop rebalance, round 11)
def test_metric_pool_backpressure_bounds_pending(tmp_path):
    """With workers > 0 the pending-futures queue must stay bounded (each
    queued item pins two full-res float64 images; an unbounded queue OOMs
    long sweeps)."""
    from ucod_dpl_tpu.utils.metrics import CODStatistics

    stats = CODStatistics(workers=1)
    try:
        gt = (np.random.default_rng(0).random((32, 32)) > 0.5).astype(float)
        for _ in range(80):
            stats.step(gt[None], gt[None])
            assert len(stats._pending) <= 4 * 1 + 32 + 1
        res = stats.get_result()
        assert res["MAE"] == 0.0 and len(stats._mae) == 80
    finally:
        stats.close()


def test_stats_close_stops_pool():
    from ucod_dpl_tpu.utils.metrics import CODStatistics

    stats = CODStatistics(workers=1)
    gt = np.zeros((16, 16))
    stats.step(gt[None], gt[None])
    stats.close()
    assert stats._pool is None and stats._pending == []
