"""DINO ViT parity vs HuggingFace torch implementations.

No pretrained weights are available offline, so parity is proven on small
randomly-initialised Dinov2Model / ViTModel instances: we convert their state
dicts into our params and require matching key-features (the hook contract),
CLS attention rows, and final hidden states — including at off-grid input
sizes that exercise bicubic position-embedding interpolation.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ucod_dpl_tpu.models.dino import (
    DinoConfig,
    convert_hf_state_dict,
    dino_forward,
)


def _run_ours(params, cfg, pixels_nchw, want_attn=True):
    pixels = jnp.asarray(np.transpose(pixels_nchw, (0, 2, 3, 1)))
    return dino_forward(params, pixels, cfg, want_cls_attention=want_attn)


@pytest.fixture(scope="module")
def tiny_dinov2():
    from transformers import Dinov2Config, Dinov2Model

    hf_cfg = Dinov2Config(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        mlp_ratio=2,
        image_size=32,
        patch_size=8,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Dinov2Model(hf_cfg).eval()
    cfg = DinoConfig(
        variant="dinov2",
        image_size=32,
        patch_size=8,
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        mlp_ratio=2,
        layer_norm_eps=hf_cfg.layer_norm_eps,
        use_layerscale=True,
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_state_dict(sd, cfg)
    return model, cfg, params


@pytest.fixture(scope="module")
def tiny_vit():
    from transformers import ViTConfig, ViTModel

    hf_cfg = ViTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=32,
        patch_size=8,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = ViTModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = DinoConfig(
        variant="dinov1",
        image_size=32,
        patch_size=8,
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        mlp_ratio=2,
        layer_norm_eps=hf_cfg.layer_norm_eps,
        use_layerscale=False,
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_state_dict(sd, cfg)
    return model, cfg, params


def _hook_key(model):
    captured = {}

    def hook(module, inp, out):
        captured["key"] = out.detach()

    model.encoder.layer[-1].attention.attention.key.register_forward_hook(hook)
    return captured


@pytest.mark.parametrize("size", [32, 48])  # native + interpolated pos-embed
def test_dinov2_parity(tiny_dinov2, size):
    model, cfg, params = tiny_dinov2
    captured = _hook_key(model)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, size, size)).astype(np.float32)

    with torch.no_grad():
        out_t = model(torch.from_numpy(x), output_attentions=True)

    ours = _run_ours(params, cfg, x)

    key_t = captured["key"].numpy()
    np.testing.assert_allclose(
        np.asarray(ours["key_tokens"]), key_t, rtol=1e-4, atol=1e-4
    )
    g = size // cfg.patch_size
    np.testing.assert_allclose(
        np.asarray(ours["key_features"]).reshape(2, g * g, -1),
        key_t[:, 1:, :],
        rtol=1e-4,
        atol=1e-4,
    )
    cls_attn_t = out_t.attentions[-1][:, :, 0, :].numpy()
    np.testing.assert_allclose(
        np.asarray(ours["cls_attention"]), cls_attn_t, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["last_hidden"]),
        out_t.last_hidden_state.numpy(),
        rtol=1e-3,
        atol=1e-4,
    )


@pytest.mark.parametrize("size", [32, 48])
def test_dinov1_parity(tiny_vit, size):
    model, cfg, params = tiny_vit
    captured = _hook_key(model)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, size, size)).astype(np.float32)

    with torch.no_grad():
        out_t = model(
            torch.from_numpy(x), output_attentions=True, interpolate_pos_encoding=True
        )

    ours = _run_ours(params, cfg, x)
    key_t = captured["key"].numpy()
    np.testing.assert_allclose(
        np.asarray(ours["key_tokens"]), key_t, rtol=1e-4, atol=1e-4
    )
    cls_attn_t = out_t.attentions[-1][:, :, 0, :].numpy()
    np.testing.assert_allclose(
        np.asarray(ours["cls_attention"]), cls_attn_t, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["last_hidden"]),
        out_t.last_hidden_state.numpy(),
        rtol=1e-3,
        atol=1e-4,
    )


def test_pallas_attention_interpret_matches_xla():
    """The Pallas flash kernel (interpret mode on CPU) must match the XLA path."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from ucod_dpl_tpu.ops import attention as A

    rng = np.random.default_rng(2)
    b, l, nh, hd = 2, 200, 4, 64  # non-multiple-of-block seq length
    q = jnp.asarray(rng.standard_normal((b * nh, l, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b * nh, l, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b * nh, l, hd)).astype(np.float32))
    ref = A._xla_attention(q, k, v, scale=0.125)
    with pltpu.force_tpu_interpret_mode():
        ours = A._pallas_attention(q, k, v, 0.125, block_q=128)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_packed_attention_interpret_matches_mha():
    """The packed-layout kernel (head slicing via BlockSpec index maps) must
    match the reference multi-head computation."""
    from jax.experimental.pallas import tpu as pltpu

    from ucod_dpl_tpu.ops import attention as A

    rng = np.random.default_rng(3)
    b, l, nh, hd = 2, 150, 4, 64
    d = nh * hd
    q = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))

    def split(x):
        return x.reshape(b, l, nh, hd).transpose(0, 2, 1, 3).reshape(b * nh, l, hd)

    ref = A._xla_attention(split(q), split(k), split(v), scale=0.1)
    ref = np.asarray(ref).reshape(b, nh, l, hd).transpose(0, 2, 1, 3).reshape(b, l, d)
    with pltpu.force_tpu_interpret_mode():
        ours = A._pallas_attention_packed(q, k, v, nh, 0.1)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_fused_layernorm_ops_match_composition(monkeypatch):
    """layernorm_qkv / layernorm_fc1_gelu (Pallas, interpret mode) must match
    the unfused layernorm+dense composition."""
    import jax

    from ucod_dpl_tpu.models.dino import _dense, _layernorm
    from ucod_dpl_tpu.ops import fused_layers as F

    rng = np.random.default_rng(7)
    b, l, d = 2, 150, 128
    x = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    norm = {"scale": jnp.asarray(rng.standard_normal(d).astype(np.float32)),
            "bias": jnp.asarray(rng.standard_normal(d).astype(np.float32))}
    lin = lambda dout: {
        "w": jnp.asarray(rng.standard_normal((d, dout)).astype(np.float32) * 0.05),
        "b": jnp.asarray(rng.standard_normal(dout).astype(np.float32)),
    }
    qp, kp, vp, f1 = lin(d), lin(d), lin(d), lin(4 * d)

    h = _layernorm(x, norm, 1e-6)
    ref_q = _dense(h, qp, x.dtype)
    ref_f1 = jax.nn.gelu(_dense(h, f1, x.dtype), approximate=True)

    monkeypatch.setenv("UCOD_PALLAS_INTERPRET", "1")
    q, k, v = F.layernorm_qkv(x, norm, qp, kp, vp, 1e-6)
    got_f1 = F._pallas_layernorm_fc1_gelu(
        x, norm["scale"].reshape(1, d), norm["bias"].reshape(1, d),
        f1["w"], f1["b"].reshape(1, 4 * d), 1e-6,
    )
    np.testing.assert_allclose(np.asarray(q), np.asarray(ref_q), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_f1), np.asarray(ref_f1), rtol=1e-5, atol=1e-5)


def test_pallas_packed_attention_bf16_shift_softmax():
    """bf16 inputs take the shift-invariant softmax with bf16 probabilities
    (the on-TPU hot path, attention.py::_attention_kernel_headpair): must
    match the f32 XLA reference within bf16 rounding, including rows whose
    logits sit well away from zero (exercising the constant-shift guard
    band), and must stay finite."""
    from jax.experimental.pallas import tpu as pltpu

    from ucod_dpl_tpu.ops import attention as A

    rng = np.random.default_rng(11)
    b, l, nh, hd = 2, 150, 4, 64
    d = nh * hd
    q = rng.standard_normal((b, l, d)).astype(np.float32)
    k = rng.standard_normal((b, l, d)).astype(np.float32)
    v = rng.standard_normal((b, l, d)).astype(np.float32)
    # push some rows' logits far from zero (|s| ~ 3*8 = 24 natural units,
    # comparable to real DINOv2 outlier-token logits)
    q[0, :10] *= 3.0
    q[1, :10] *= -3.0

    def split(x):
        return x.reshape(b, l, nh, hd).transpose(0, 2, 1, 3).reshape(b * nh, l, hd)

    ref = A._xla_attention(split(jnp.asarray(q)), split(jnp.asarray(k)),
                           split(jnp.asarray(v)), scale=0.125)
    ref = np.asarray(ref).reshape(b, nh, l, hd).transpose(0, 2, 1, 3).reshape(b, l, d)

    qb, kb, vb = (jnp.asarray(x, dtype=jnp.bfloat16) for x in (q, k, v))
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(A._pallas_attention_packed(qb, kb, vb, nh, 0.125)).astype(np.float32)
    assert np.isfinite(ours).all()
    # bf16 inputs + bf16 probabilities: ~1% relative agreement expected
    np.testing.assert_allclose(ours, ref, rtol=0.05, atol=0.05)


def test_pallas_attention_rowmax_escape_hatch(monkeypatch):
    """UCOD_ATTN_ROWMAX_SOFTMAX=1 restores the row-max-subtracted softmax and
    still matches the XLA reference."""
    from jax.experimental.pallas import tpu as pltpu

    from ucod_dpl_tpu.ops import attention as A

    monkeypatch.setenv("UCOD_ATTN_ROWMAX_SOFTMAX", "1")
    rng = np.random.default_rng(13)
    b, l, nh, hd = 1, 130, 2, 64
    d = nh * hd
    q = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))

    def split(x):
        return x.reshape(b, l, nh, hd).transpose(0, 2, 1, 3).reshape(b * nh, l, hd)

    ref = A._xla_attention(split(q), split(k), split(v), scale=0.125)
    ref = np.asarray(ref).reshape(b, nh, l, hd).transpose(0, 2, 1, 3).reshape(b, l, d)
    with pltpu.force_tpu_interpret_mode():
        ours = A._pallas_attention_packed(q, k, v, nh, 0.125)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_key_fold_matches_unfused_eval_path():
    """dino_forward(key_fold=Wk@Wd) + rev_decoder_forward_decoupled must
    reproduce the unfused composition (full key projection -> decoupling ->
    resize -> decoder body) exactly (f32: same maths, different association)."""
    import jax

    from ucod_dpl_tpu.models.dba import (
        init_rev_decoder,
        key_decoupling_fold,
        rev_decoder_forward_decoupled,
        rev_decoder_forward_resized,
    )
    from ucod_dpl_tpu.models.dino import init_dino

    cfg = DinoConfig(
        variant="dinov2", image_size=32, patch_size=8, hidden_size=64,
        num_layers=2, num_heads=4, mlp_ratio=2,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    backbone = init_dino(k1, cfg)
    decoder = init_rev_decoder(k2, cfg.hidden_size)
    pixels = jnp.asarray(
        np.random.default_rng(6).standard_normal((2, 32, 32, 3)).astype(np.float32)
    )

    out = dino_forward(backbone, pixels, cfg)
    fg_ref, bg_ref, _ = rev_decoder_forward_resized(
        decoder, out["key_features"], 8, with_loss=False
    )

    last_k = backbone["layers"][-1]["k"]
    fold = key_decoupling_fold(last_k["w"], last_k["b"], decoder)
    out_f = dino_forward(backbone, pixels, cfg, key_fold=fold)
    assert "last_hidden" not in out_f and "key_tokens" not in out_f
    assert out_f["folded_features"].shape == (2, 4, 4, 128)
    fg, bg, _ = rev_decoder_forward_decoupled(
        decoder, out_f["folded_features"], 8, with_loss=False
    )
    np.testing.assert_allclose(np.asarray(fg), np.asarray(fg_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(bg), np.asarray(bg_ref), rtol=2e-4, atol=2e-5)


def test_fg_logits_live_non_square_native_grid():
    """size=None must keep the native (gh, gw) grid — non-square inputs
    (serving Predictor with rectangular image_size feeds the LookTwice crop
    pass) must not be silently resized square."""
    import jax

    from ucod_dpl_tpu.models.dba import fg_logits_live, init_rev_decoder, rev_decoder_forward
    from ucod_dpl_tpu.models.dino import init_dino

    cfg = DinoConfig(
        variant="dinov2", image_size=32, patch_size=8, hidden_size=64,
        num_layers=2, num_heads=4, mlp_ratio=2,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    backbone = init_dino(k1, cfg)
    decoder = init_rev_decoder(k2, cfg.hidden_size)
    pixels = jnp.asarray(
        np.random.default_rng(8).standard_normal((2, 24, 40, 3)).astype(np.float32)
    )  # grid (3, 5)

    fg, bg, _ = fg_logits_live(backbone, decoder, pixels, cfg, compute_dtype=jnp.float32)
    assert fg.shape == (2, 3, 5, 1)

    out = dino_forward(backbone, pixels, cfg)
    fg_ref, _, _ = rev_decoder_forward(decoder, out["key_features"], with_loss=False)
    np.testing.assert_allclose(np.asarray(fg), np.asarray(fg_ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("garbage", [np.inf, np.nan, 3e38])
def test_pallas_attention_garbage_tail_rows(garbage):
    """Composed XLA programs leave GARBAGE (Inf/NaN/huge) in the physical
    tile padding beyond seq_len; the kernels must produce finite, correct
    outputs regardless (round-4 regression: the additive mask row turned
    Inf-tail scores into NaN denominators — every TPU forward was silently
    all-NaN while host-fed standalone tests passed on zeroed pads)."""
    import functools

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ucod_dpl_tpu.ops import attention as A

    b, seq_len, lp, nh, hd = 1, 200, 256, 2, 64
    d = nh * hd
    rng = np.random.default_rng(21)
    q = rng.standard_normal((b, lp, d)).astype(np.float32)
    k = rng.standard_normal((b, lp, d)).astype(np.float32)
    v = rng.standard_normal((b, lp, d)).astype(np.float32)
    for arr in (q, k, v):
        arr[:, seq_len:, :] = garbage  # simulated tile-padding garbage

    ref = A._xla_attention(
        *(x[:, :seq_len].reshape(b, seq_len, nh, hd).transpose(0, 2, 1, 3).reshape(b * nh, seq_len, hd)
          for x in (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))),
        scale=0.125,
    )
    ref = np.asarray(ref).reshape(b, nh, seq_len, hd).transpose(0, 2, 1, 3).reshape(b, seq_len, d)

    out = pl.pallas_call(
        functools.partial(
            A._attention_kernel_headpair, seq_len=seq_len, scale=0.125, head_dim=hd,
            rowmax=False,
        ),
        grid=(b, nh // 2, 1),
        in_specs=[
            pl.BlockSpec((1, lp, 2 * hd), lambda bb, h, i: (bb, i, h), memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec(
            (1, lp, 2 * hd), lambda bb, h, i: (bb, i, h), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, lp, d), jnp.float32),
        interpret=True,
    )(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    valid = np.asarray(out)[:, :seq_len, :]
    assert np.isfinite(valid).all(), "garbage tail leaked into valid rows"
    np.testing.assert_allclose(valid, ref, rtol=1e-5, atol=1e-5)


def test_pallas_packed_attention_multi_qblock(monkeypatch):
    """The q-blocked grid path (block_q < Lp — taken at 756px where the
    score tile exceeds the VMEM budget) must match XLA; the whole-q 518px
    path is covered by the other packed tests."""
    from jax.experimental.pallas import tpu as pltpu

    from ucod_dpl_tpu.ops import attention as A

    monkeypatch.setattr(A, "_pick_q_block", lambda lp, *a, **k: 128)
    rng = np.random.default_rng(31)
    b, l, nh, hd = 1, 300, 4, 64  # lp=384 -> 3 q-blocks of 128
    d = nh * hd
    q = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))

    def split(x):
        return x.reshape(b, l, nh, hd).transpose(0, 2, 1, 3).reshape(b * nh, l, hd)

    ref = A._xla_attention(split(q), split(k), split(v), scale=0.125)
    ref = np.asarray(ref).reshape(b, nh, l, hd).transpose(0, 2, 1, 3).reshape(b, l, d)
    with pltpu.force_tpu_interpret_mode():
        ours = A._pallas_attention_packed(q, k, v, nh, 0.125)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)
