"""Full train-state checkpoint/resume: bit-exact state restoration and
training continuation equivalence."""

import numpy as np

import jax
import jax.numpy as jnp

from ucod_dpl_tpu.engine.checkpoint import load_train_state, save_train_state
from ucod_dpl_tpu.engine.train_step import make_optimizer, make_train_step

from test_train import DIM, _batch, _init_state, _train_cfg


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
