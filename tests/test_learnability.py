"""End-to-end learnability: on linearly-separable synthetic features the
full stage-1 algorithm (teacher/student/APM/discriminator) must fit the
pseudo-labels."""

import numpy as np

import jax
import jax.numpy as jnp

from ucod_dpl_tpu.engine.train_step import make_optimizer, make_train_step
from ucod_dpl_tpu.models.dba import rev_decoder_forward

from test_train import DIM, FS, _init_state, _train_cfg


def _separable_batch(seed=0, b=8, grid=16):
    """Features whose first channels carry the mask signal."""
    rng = np.random.default_rng(seed)
    masks = np.zeros((b, grid, grid, 1), np.float32)
    for i in range(b):
        y, x = rng.integers(2, grid - 6, size=2)
        masks[i, y : y + 5, x : x + 5] = 1.0
    feats = rng.standard_normal((b, grid, grid, DIM)).astype(np.float32) * 0.1
    feats[..., :8] += masks * 3.0  # strong foreground signature
    return jnp.asarray(feats), jnp.asarray(masks)


def test_stage1_fits_separable_data():
    cfg = _train_cfg()
    # direct pseudo-label supervision: with a *random* discriminator the APM
    # weight saturates at ~1 (|p_s - p_p| ~ 0) and the student would chase
    # the random teacher — the reference mitigates this by pre-training the
    # discriminator each dis_intertrain epoch; here we isolate decoder
    # learnability from that dynamic.
    cfg.train_cfg.merge_method = "none"
    optimizer = make_optimizer(5e-3, 0.95, 1000)
    dis_optimizer = make_optimizer(1e-3, 0.95, 1000)
    step = jax.jit(make_train_step(cfg, optimizer))
    state = _init_state(cfg, optimizer, dis_optimizer)
    feats, masks = _separable_batch()

    losses = []
    for i in range(60):
        state, aux = step(state, feats, masks, jnp.float32(0.0), jnp.float32(1.0))
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0], (losses[0], losses[-1])

    # student prediction quality on the training batch
    from ucod_dpl_tpu.ops import interpolate_bilinear

    f = interpolate_bilinear(jnp.transpose(feats, (0, 3, 1, 2)), (FS, FS)).transpose(
        0, 2, 3, 1
    )
    fg, bg_rev, _ = rev_decoder_forward(state.decoder, f, with_loss=False)
    pred = np.asarray(jax.nn.sigmoid(fg[..., 0])) > 0.5
    target = (
        np.asarray(
            interpolate_bilinear(jnp.transpose(masks, (0, 3, 1, 2)), (FS, FS))
        )[:, 0]
        > 0.5
    )
    iou = (pred & target).sum() / max((pred | target).sum(), 1)
    assert iou > 0.5, iou

    # reverse branch learned the complement
    bg_pred = np.asarray(jax.nn.sigmoid(bg_rev[..., 0])) > 0.5
    bg_iou = (bg_pred & ~target).sum() / max((bg_pred | ~target).sum(), 1)
    assert bg_iou > 0.5, bg_iou

    # EMA teacher converged towards the student
    fg_t, _, _ = rev_decoder_forward(state.decoder_ema, f, with_loss=False)
    pred_t = np.asarray(jax.nn.sigmoid(fg_t[..., 0])) > 0.5
    agree = (pred_t == pred).mean()
    assert agree > 0.8, agree
