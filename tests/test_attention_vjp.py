"""Flash-attention backward (custom_vjp) parity.

The packed Pallas kernel carries a recompute-based flash backward
(``ops/attention.py::_pallas_attention_packed_bwd``) so differentiated
paths (LoRA through the backbone, reference intent ``full_model.py:47-72``)
keep the kernel instead of falling back to XLA attention + remat.  These
tests pin ``jax.grad`` through ``multi_head_attention`` against the XLA VJP
in interpret mode (exact same kernel code path as TPU, minus Mosaic boundary
masking); the on-chip check lives in ``scripts/tpu_selfcheck.py``.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ucod_dpl_tpu.ops.attention import _xla_attention, multi_head_attention


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("UCOD_PALLAS_INTERPRET", "1")


def _xla_mha(q, k, v, num_heads, scale):
    b, l, d = q.shape
    hd = d // num_heads

    def split(x):
        return x.reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3).reshape(
            b * num_heads, l, hd
        )

    o = _xla_attention(split(q), split(k), split(v), scale)
    return o.reshape(b, num_heads, l, hd).transpose(0, 2, 1, 3).reshape(b, l, d)


# 150 exercises the boundary block (not a multiple of 128); 128 the aligned
# path; 12 heads = ViT-B
@pytest.mark.parametrize("seq_len,num_heads", [(150, 2), (128, 2), (90, 12)])
def test_grad_matches_xla_vjp(seq_len, num_heads):
    rng = np.random.default_rng(0)
    hd = 64
    d = num_heads * hd
    scale = 1.0 / np.sqrt(hd)
    q, k, v = (
        jnp.asarray(rng.standard_normal((2, seq_len, d)), jnp.float32)
        for _ in range(3)
    )
    # a non-trivial upstream cotangent (sum-of-squares)
    loss_p = lambda *a: jnp.sum(multi_head_attention(*a, num_heads, scale=scale) ** 2)
    loss_x = lambda *a: jnp.sum(_xla_mha(*a, num_heads, scale) ** 2)

    grads_p = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    grads_x = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for name, gp, gx in zip("qkv", grads_p, grads_x):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), rtol=2e-4, atol=2e-5,
            err_msg=f"d{name}",
        )


@pytest.mark.parametrize("seq_len,num_heads", [(150, 2), (256, 12)])
def test_longl_grad_matches_xla_vjp(seq_len, num_heads, monkeypatch):
    """The KV-blocked long-L backward (stats forward + _bwd2d kernels) vs
    the XLA VJP — forced at small L by making the whole-KV VMEM law refuse,
    exactly how 756px engages it on chip.  150 exercises boundary blocks on
    BOTH grid dims; 256 the aligned path."""
    from ucod_dpl_tpu.ops import attention as A

    monkeypatch.setattr(A, "_bwd_block_q", lambda lp, itemsize: None)
    jax.clear_caches()
    rng = np.random.default_rng(7)
    hd = 64
    d = num_heads * hd
    scale = 1.0 / np.sqrt(hd)
    q, k, v = (
        jnp.asarray(rng.standard_normal((2, seq_len, d)), jnp.float32)
        for _ in range(3)
    )
    loss_p = lambda *a: jnp.sum(multi_head_attention(*a, num_heads, scale=scale) ** 2)
    loss_x = lambda *a: jnp.sum(_xla_mha(*a, num_heads, scale) ** 2)

    grads_p = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    grads_x = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for name, gp, gx in zip("qkv", grads_p, grads_x):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), rtol=2e-4, atol=2e-5,
            err_msg=f"d{name} (long-L path)",
        )
    jax.clear_caches()  # drop programs traced under the patched law


def test_stats_forward_matches_plain_forward(monkeypatch):
    """The stats forward (VJP variant for long L) must agree with the
    inference forward — identical math, f32-exact denominators — and its
    saved denominators must equal an explicit f32 softmax denominator."""
    from ucod_dpl_tpu.ops import attention as A

    rng = np.random.default_rng(9)
    b, l, nh, hd = 2, 150, 2, 64
    scale = 1.0 / np.sqrt(hd)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, l, nh * hd)), jnp.float32)
        for _ in range(3)
    )
    o_plain = A._pallas_attention_packed(q, k, v, nh, scale, rowmax=False)
    o_stats, den = A._pallas_attention_packed_stats(q, k, v, nh, scale)
    np.testing.assert_allclose(
        np.asarray(o_stats), np.asarray(o_plain), rtol=1e-6, atol=1e-7
    )
    assert den.shape == (b, nh // 2, l, 8)
    # explicit denominator: sum over keys of exp2(scale*log2e*q.k - SHIFT)
    qh = q.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(qh), np.asarray(kh))
    ref_den = np.exp2(
        s * scale * np.log2(np.e) - A._SOFTMAX_SHIFT
    ).sum(-1)  # (b, nh, l)
    got0 = np.asarray(den)[:, 0, :, 0]  # head 0, lane 0
    got1 = np.asarray(den)[:, 0, :, 4]  # head 1, lane 4
    np.testing.assert_allclose(got0, ref_den[:, 0], rtol=1e-5)
    np.testing.assert_allclose(got1, ref_den[:, 1], rtol=1e-5)


def test_block_laws_pin_chip_calibrated_picks():
    """The VMEM block laws are calibrated against on-chip compiler OOM
    reports (see each law's docstring); this pins the PICKS at the
    production lengths so a refactor cannot silently change a
    chip-validated configuration.  518px: Lp=1408; 756px: Lp=2944;
    1036px: Lp=5504 (where the stats forward's 58%-budget law was
    calibrated — full budget picked 688 and OOM'd at 24.42M of 16M)."""
    from ucod_dpl_tpu.ops import attention as A

    stats_budget = int(A._score_budget_bytes() * 0.58)
    # forward q-blocks (plain vs stats) — chip-validated on v5e
    assert A._pick_q_block(1408) == 1408
    assert A._pick_q_block(2944) == 736
    assert A._pick_q_block(1408, stats_budget) == 1408
    assert A._pick_q_block(2944, stats_budget) == 736
    assert A._pick_q_block(5504, stats_budget) == 128  # 688 OOM'd on chip
    # whole-KV backward feasibility: fits at 518px, refuses at 756px+
    assert A._bwd_block_q(1408, 2) == 352
    assert A._bwd_block_q(2944, 2) is None and A._bwd_block_q(2944, 4) is None
    # long-L 2D blocks: the measured pair-tile law (bq*bk <= ~1.1M)
    assert A._pick_2d_blocks(2944) == (736, 1472)
    assert A._pick_2d_blocks(1408) == (704, 1408)
    for lp in (128, 2944, 5504, 11392):
        bq, bk = A._pick_2d_blocks(lp)
        assert lp % bq == 0 and lp % bk == 0 and bq % 16 == 0 and bk % 16 == 0
        assert bq * bk <= 1_100_000


def test_grad_cotangent_dtype_matches_primal():
    """custom_vjp cotangents must come back in the primal dtype (bf16 on the
    TPU path) or jax raises at transpose time."""
    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 64, 128)), jnp.bfloat16)
        for _ in range(3)
    )
    g = jax.grad(
        lambda a, b, c: jnp.sum(
            multi_head_attention(a, b, c, 2, scale=0.125).astype(jnp.float32)
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for x in g:
        assert x.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(x.astype(jnp.float32)).all())


def test_value_unchanged_by_vjp_wrapper():
    """The custom_vjp wrapper must not perturb the forward value."""
    from ucod_dpl_tpu.ops.attention import _pallas_attention_packed

    rng = np.random.default_rng(2)
    q, k, v = (
        jnp.asarray(rng.standard_normal((2, 150, 128)), jnp.float32)
        for _ in range(3)
    )
    a = multi_head_attention(q, k, v, 2, scale=0.125)
    b = _pallas_attention_packed(q, k, v, 2, 0.125)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_finite_with_rowmax_escape_hatch(monkeypatch):
    """UCOD_ATTN_ROWMAX_SOFTMAX=1 exists for inputs that breach the fixed-
    shift guard band; the backward must honour it too (the flash backward's
    fixed-shift softmax recompute would overflow on exactly those inputs,
    so rowmax routes the VJP to the row-max-stable XLA backward)."""
    monkeypatch.setenv("UCOD_ATTN_ROWMAX_SOFTMAX", "1")
    rng = np.random.default_rng(4)
    # logit std ~40 natural-log units -> row maxima well past the ~109
    # overflow threshold of the fixed-shift exp2 (the flash backward would
    # produce Inf/NaN here), while the softmax stays numerically comparable
    q, k, v = (
        jnp.asarray(2.25 * rng.standard_normal((1, 150, 128)), jnp.float32)
        for _ in range(3)
    )
    # confirm the magnitudes actually breach the guard band
    s = np.einsum("qd,kd->qk", np.asarray(q[0, :, :64]), np.asarray(k[0, :, :64]))
    assert s.max() > 130.0, "test inputs no longer breach the guard band"
    loss_p = lambda *a: jnp.sum(multi_head_attention(*a, 2, scale=1.0) ** 2)
    loss_x = lambda *a: jnp.sum(_xla_mha(*a, 2, 1.0) ** 2)
    grads_p = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    grads_x = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for name, gp, gx in zip("qkv", grads_p, grads_x):
        assert bool(jnp.isfinite(gp).all()), f"d{name} not finite"
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), rtol=1e-2, atol=1e-2,
            err_msg=f"d{name}",
        )


def test_dino_lora_grads_with_flash_vjp():
    """End-to-end: LoRA-style grads through a tiny DINO backbone with the
    Pallas attention + flash VJP (interpret) match the XLA-attention path
    (UCOD_ATTN_XLA_VJP escape hatch) — proving differentiated backbone
    traces keep the kernel and get the same gradients."""
    from ucod_dpl_tpu.models.dino import DinoConfig, dino_forward, init_dino
    from ucod_dpl_tpu.ops.attention import differentiable_mode

    cfg = DinoConfig(
        variant="dinov2", image_size=32, patch_size=8, hidden_size=64,
        num_layers=2, num_heads=2, mlp_ratio=2, use_layerscale=True,
    )
    params = init_dino(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    px = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)

    def loss(p):
        out = dino_forward(p, px, cfg=cfg, compute_dtype=jnp.float32)
        return jnp.sum(out["key_features"] ** 2)

    with differentiable_mode():
        g_flash = jax.grad(loss)(params)
    os.environ["UCOD_ATTN_XLA_VJP"] = "1"
    try:
        with differentiable_mode():
            g_xla = jax.grad(loss)(params)
    finally:
        del os.environ["UCOD_ATTN_XLA_VJP"]

    flat_f, _ = jax.tree.flatten(g_flash)
    flat_x, _ = jax.tree.flatten(g_xla)
    for a, b in zip(flat_f, flat_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
        )
