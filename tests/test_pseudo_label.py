"""Pseudo-label cue parity vs the reference torch implementation."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from ucod_dpl_tpu.ops.pseudo_label import (
    compute_background_mask,
    refine_small_components,
)

from conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref_bkg():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ref_bkg", os.path.join(REFERENCE_ROOT, "data/utils/found_bkg_mask.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_bkg"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_background_mask_parity(ref_bkg):
    """Random attention/key tensors through both implementations."""
    import torch

    rng = np.random.default_rng(0)
    nb, nh, grid, dim = 3, 4, 16, 12
    n = grid * grid
    c = nh * dim
    # softmax-like attention rows over 1+N tokens
    logits = rng.standard_normal((nb, nh, 1 + n, 1 + n)).astype(np.float32)
    attn = torch.softmax(torch.from_numpy(logits), dim=-1)
    key = rng.standard_normal((nb, 1 + n, c)).astype(np.float32)

    ref_mask, ref_sim = ref_bkg.compute_img_bkg_seg(
        attentions=attn,
        feats=torch.from_numpy(key),
        featmap_dims=(grid, grid),
        th_bkg=0.6,
        dim=dim,
    )

    cls_attn = attn[:, :, 0, :].numpy()  # (B, nh, 1+N)
    our_mask, our_sim = compute_background_mask(
        jnp.asarray(cls_attn), jnp.asarray(key), (grid, grid), th_bkg=0.6
    )

    np.testing.assert_array_equal(np.asarray(our_mask), ref_mask.numpy())
    np.testing.assert_allclose(np.asarray(our_sim), ref_sim.numpy(), rtol=1e-4, atol=1e-5)


def test_refine_small_components_parity():
    """Host cleanup vs the reference implementation (which needs cv2)."""
    cv2 = pytest.importorskip("cv2")
    import ast

    import torch

    # run only the oracle function (the module's other imports need
    # torchvision/transformers plumbing we don't want in tests)
    src = open(os.path.join(REFERENCE_ROOT, "generate_pseudo_label.py")).read()
    tree = ast.parse(src)
    fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "refine_post_process"
    )
    ns = {"np": np, "cv2": cv2, "torch": torch}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), "<ref>", "exec"), ns)

    class _Mod:
        refine_post_process = staticmethod(ns["refine_post_process"])

    mod = _Mod()

    rng = np.random.default_rng(1)
    for trial in range(6):
        mask = (rng.random((16, 16)) > 0.7).astype(np.float32)
        # sprinkle isolated single pixels to exercise the flip logic
        mask[2, 2] = 1.0
        mask[10, 10] = 1.0

        ref = mod.refine_post_process(torch.from_numpy(mask[None].copy()))
        ours = refine_small_components(mask.copy())
        np.testing.assert_array_equal(ours, ref.numpy()[0])


def test_refine_flips_isolated_pixel():
    mask = np.zeros((8, 8), np.float32)
    mask[4, 4] = 1.0  # isolated pixel fully surrounded by 0
    out = refine_small_components(mask)
    assert out[4, 4] == 0.0

    mask2 = np.zeros((8, 8), np.float32)
    mask2[2:7, 2:7] = 1.0  # big block survives
    out2 = refine_small_components(mask2)
    np.testing.assert_array_equal(out2, mask2)
