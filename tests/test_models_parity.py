"""Numerical parity of the JAX DBA decoder / discriminator vs the PyTorch
reference, using the actual shipped checkpoints where available."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from ucod_dpl_tpu.models import (
    init_discriminator,
    discriminator_forward,
    load_decoder_checkpoint,
    rev_decoder_forward,
    save_decoder_checkpoint,
)

from conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

CKPT_V2 = os.path.join(REFERENCE_ROOT, "weights", "UCOD_DPL_dinov2.safetensors")
CKPT_V1 = os.path.join(REFERENCE_ROOT, "weights", "UCOD_DPL_dinov1.safetensors")


def _load_module_from_file(name, path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_modules():
    # load the reference model files directly: importing the `models` package
    # would pull in torchvision-dependent backbones we don't need
    sys.path.insert(0, REFERENCE_ROOT)
    dba_mod = _load_module_from_file(
        "_ref_dba", os.path.join(REFERENCE_ROOT, "models/modules/DBA.py")
    )
    dis_mod = _load_module_from_file(
        "_ref_dis", os.path.join(REFERENCE_ROOT, "models/discriminator.py")
    )
    yield dba_mod, dis_mod
    sys.path.remove(REFERENCE_ROOT)


class _Cfg:
    def __init__(self, **kw):
        self.__dict__.update(kw)


@pytest.mark.parametrize("ckpt", [CKPT_V2, CKPT_V1])
def test_decoder_checkpoint_parity(ref_modules, ckpt):
    """Shipped checkpoint through both decoders -> near-identical logits."""
    import torch
    from safetensors.torch import load_file as torch_load

    dba_mod, _ = ref_modules
    torch_model = dba_mod.RevDecoder(_Cfg(dim=768))
    torch_model.load_state_dict(
        {
            k[len("decoder.") :]: v
            for k, v in torch_load(ckpt).items()
            if k.startswith("decoder.") and not k.startswith("decoder_ema.")
        }
    )
    torch_model.eval()

    student, _ema = load_decoder_checkpoint(ckpt)

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 768, 68, 68)).astype(np.float32)

    with torch.no_grad():
        fg_t, bg_t, ortho_t = torch_model(torch.from_numpy(feats))

    feats_nhwc = jnp.asarray(np.transpose(feats, (0, 2, 3, 1)))
    fg_j, bg_j, ortho_j = rev_decoder_forward(student, feats_nhwc)

    np.testing.assert_allclose(
        np.asarray(fg_j)[..., 0], fg_t.numpy()[:, 0], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(bg_j)[..., 0], bg_t.numpy()[:, 0], rtol=1e-4, atol=1e-4
    )
    assert np.isclose(float(ortho_j), float(ortho_t), rtol=1e-3, atol=1e-6)


def test_reverse_interop_jax_checkpoint_into_torch(ref_modules, tmp_path):
    """Checkpoints saved by THIS framework load into the torch reference and
    produce the same outputs (bidirectional interchange)."""
    import torch
    from safetensors.torch import load_file as torch_load

    import jax

    from ucod_dpl_tpu.models.dba import init_rev_decoder, rev_decoder_forward

    dba_mod, _ = ref_modules
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    student = init_rev_decoder(k1, 768)
    ema = init_rev_decoder(k2, 768)
    path = str(tmp_path / "ours.safetensors")
    save_decoder_checkpoint(path, student, ema)

    torch_model = dba_mod.RevDecoder(_Cfg(dim=768))
    torch_model.load_state_dict(
        {
            k[len("decoder.") :]: v
            for k, v in torch_load(path).items()
            if k.startswith("decoder.") and not k.startswith("decoder_ema.")
        }
    )
    torch_model.eval()

    rng = np.random.default_rng(5)
    feats = rng.standard_normal((1, 768, 34, 34)).astype(np.float32)
    with torch.no_grad():
        fg_t, _, _ = torch_model(torch.from_numpy(feats))
    fg_j, _, _ = rev_decoder_forward(
        student, jnp.asarray(np.transpose(feats, (0, 2, 3, 1)))
    )
    np.testing.assert_allclose(
        np.asarray(fg_j)[..., 0], fg_t.numpy()[:, 0], rtol=1e-4, atol=1e-4
    )


def test_decoder_checkpoint_roundtrip(tmp_path):
    student, ema = load_decoder_checkpoint(CKPT_V2)
    out = tmp_path / "resaved.safetensors"
    save_decoder_checkpoint(str(out), student, ema)
    s2, e2 = load_decoder_checkpoint(str(out))
    for a, b in zip(student, s2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(ema, e2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _torch_dis_to_params(torch_dis, use_features: bool):
    """Convert a reference Discriminator state into our (params, stats).

    Copies are essential: CPU JAX zero-copies numpy views, and torch updates
    BN buffers in place during forward."""
    sd = {k: v.detach().numpy().copy() for k, v in torch_dis.state_dict().items()}

    def block(prefix):
        p = {
            "conv_w": jnp.asarray(np.transpose(sd[f"{prefix}.layers.0.weight"], (2, 3, 1, 0))),
            "bn_scale": jnp.asarray(sd[f"{prefix}.layers.1.weight"]),
            "bn_bias": jnp.asarray(sd[f"{prefix}.layers.1.bias"]),
        }
        s = {
            "mean": jnp.asarray(sd[f"{prefix}.layers.1.running_mean"]),
            "var": jnp.asarray(sd[f"{prefix}.layers.1.running_var"]),
        }
        return p, s

    mask_p, mask_s = block("maskConv")
    c0_p, c0_s = block("convs.0")
    c1_p, c1_s = block("convs.1")
    params = {
        "mask_conv": mask_p,
        "convs": [c0_p, c1_p],
        "linear_w": jnp.asarray(sd["linear.weight"].T),
        "linear_b": jnp.asarray(sd["linear.bias"]),
    }
    stats = {"mask_conv": mask_s, "convs": [c0_s, c1_s]}
    if use_features:
        f_p, f_s = block("featureConv")
        params["feature_conv"] = f_p
        stats["feature_conv"] = f_s
    return params, stats


@pytest.mark.heavy  # oracle/e2e composition: full gate only (quick-loop rebalance, round 11)
@pytest.mark.parametrize("use_features", [False, True])
def test_discriminator_parity(ref_modules, use_features):
    import torch

    _, dis_mod = ref_modules
    cfg = _Cfg(dis_use_features=use_features, dim=32, feature_size=68)
    torch_dis = dis_mod.Discriminator(cfg)
    torch_dis.train()  # reference only ever runs the discriminator in train mode

    params, stats = _torch_dis_to_params(torch_dis, use_features)

    rng = np.random.default_rng(1)
    mask = rng.random((4, 1, 68, 68)).astype(np.float32)
    feats = rng.standard_normal((4, 32, 68, 68)).astype(np.float32)

    with torch.no_grad():
        ref_out = torch_dis(torch.from_numpy(mask), torch.from_numpy(feats)).numpy()

    ours, new_stats = discriminator_forward(
        params,
        stats,
        jnp.asarray(np.transpose(mask, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(feats, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-4, atol=1e-5)

    # BN running stats updated the torch way (momentum 0.1, unbiased var)
    ref_mean = torch_dis.maskConv.layers[1].running_mean.numpy()
    np.testing.assert_allclose(
        np.asarray(new_stats["mask_conv"]["mean"]), ref_mean, rtol=1e-4, atol=1e-6
    )


def test_discriminator_init_shapes():
    import jax

    params, stats = init_discriminator(
        jax.random.PRNGKey(0), feature_size=68, use_features=False
    )
    mask = jnp.zeros((2, 68, 68, 1))
    out, _ = discriminator_forward(params, stats, mask)
    assert out.shape == (2, 1)
    assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 1)
