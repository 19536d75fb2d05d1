"""Glue to run the PyTorch reference's *own* eval loops as parity oracles.

The reference (/root/reference) is imported as-is; only environment gaps are
filled in:

  * ``timm`` / ``prettytable`` / ``pytz`` / ``torchvision`` are not installed
    in this image — minimal faithful stubs cover exactly the API surface the
    reference's live path touches (PIL-backed torchvision transforms with
    documented torchvision semantics);
  * CUDA is unavailable — ``.cuda()`` / ``.to('cuda')`` are rerouted to CPU;
  * HuggingFace hub has no network — ``build_feature_extractor`` is
    monkeypatched to return a locally constructed (random-init, seeded) HF
    model shared with our JAX side via weight conversion.

This keeps the oracle equal to the reference's composition logic
(``engine/runner/loop_UCOD_DPL.py:276-417``, ``loop_CORAL.py:41-341``) while
staying runnable offline on CPU.
"""

from __future__ import annotations

import importlib
import importlib.machinery
import os
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# stubs
# ---------------------------------------------------------------------------

def _register(name: str, mod: types.ModuleType) -> types.ModuleType:
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = mod
    return mod


def _stub_timm() -> None:
    if "timm" in sys.modules:
        return
    import torch.nn as nn

    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = nn.Identity
    layers.to_2tuple = lambda x: (x, x) if isinstance(x, int) else tuple(x)
    layers.trunc_normal_ = lambda *a, **k: None
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda f: f
    models = types.ModuleType("timm.models")
    models.layers = layers
    models.registry = registry
    timm = types.ModuleType("timm")
    timm.models = models
    for name, mod in [
        ("timm", timm),
        ("timm.models", models),
        ("timm.models.layers", layers),
        ("timm.models.registry", registry),
    ]:
        _register(name, mod)


def _stub_prettytable() -> None:
    if "prettytable" in sys.modules:
        return
    mod = types.ModuleType("prettytable")

    class PrettyTable:
        def __init__(self):
            self.field_names = []
            self._rows = []

        def add_row(self, row):
            self._rows.append([str(c) for c in row])

        def get_string(self):
            head = " | ".join(str(f) for f in self.field_names)
            body = "\n".join(" | ".join(r) for r in self._rows)
            return head + "\n" + body

    mod.PrettyTable = PrettyTable
    _register("prettytable", mod)


def _stub_pytz() -> None:
    if "pytz" in sys.modules:
        return
    import zoneinfo

    mod = types.ModuleType("pytz")
    mod.timezone = zoneinfo.ZoneInfo  # datetime-compatible tzinfo
    _register("pytz", mod)
    if "ntplib" not in sys.modules:  # imported by the reference logger, unused
        _register("ntplib", types.ModuleType("ntplib"))


def _stub_torchvision() -> None:
    """PIL-backed torchvision.transforms subset with torchvision semantics:
    Resize = PIL bilinear, ToTensor = CHW float/255, Normalize = channelwise,
    ToPILImage = float*255->uint8."""
    if "torchvision" in sys.modules:
        return
    import torch
    from PIL import Image

    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.0.stub"
    transforms = types.ModuleType("torchvision.transforms")
    tf_functional = types.ModuleType("torchvision.transforms.functional")
    tv_models = types.ModuleType("torchvision.models")
    tv_io = types.ModuleType("torchvision.io")
    tv_ops = types.ModuleType("torchvision.ops")

    class Compose:
        def __init__(self, ts):
            self.transforms = list(ts)

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class Resize:
        def __init__(self, size, *a, **k):
            self.size = size

        def __call__(self, img):
            if isinstance(self.size, int):
                w, h = img.size
                if w <= h:
                    ow, oh = self.size, max(1, round(self.size * h / w))
                else:
                    oh, ow = self.size, max(1, round(self.size * w / h))
            else:
                oh, ow = self.size
            return img.resize((int(ow), int(oh)), Image.BILINEAR)

    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic, dtype=np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[None]
            else:
                arr = arr.transpose(2, 0, 1)
            return torch.from_numpy(np.ascontiguousarray(arr))

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean, dtype=torch.float32).view(-1, 1, 1)
            self.std = torch.tensor(std, dtype=torch.float32).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class ToPILImage:
        def __call__(self, pic):
            x = pic.detach().cpu() if hasattr(pic, "detach") else torch.as_tensor(pic)
            if x.ndim == 3 and x.shape[0] == 1:
                x = x[0]
            if x.is_floating_point():
                x = (x * 255).to(torch.uint8)
            arr = x.numpy()
            if arr.ndim == 2:
                return Image.fromarray(arr, mode="L")
            return Image.fromarray(arr.transpose(1, 2, 0))

    for cls in (Compose, Resize, ToTensor, Normalize, ToPILImage):
        setattr(transforms, cls.__name__, cls)
    transforms.functional = tf_functional

    def _unused(*a, **k):  # build_backbone names: imported, never called
        raise RuntimeError("torchvision stub: not implemented")

    for name in (
        "vgg16", "vgg16_bn", "VGG16_Weights", "VGG16_BN_Weights",
        "resnet50", "ResNet50_Weights",
    ):
        setattr(tv_models, name, _unused)

    tv.transforms = transforms
    tv.models = tv_models
    tv.io = tv_io
    tv.ops = tv_ops
    tv._is_tracing = lambda: False
    for name, mod in [
        ("torchvision", tv),
        ("torchvision.transforms", transforms),
        ("torchvision.transforms.functional", tf_functional),
        ("torchvision.models", tv_models),
        ("torchvision.io", tv_io),
        ("torchvision.ops", tv_ops),
    ]:
        _register(name, mod)


def install_stubs() -> None:
    _stub_timm()
    _stub_prettytable()
    _stub_pytz()
    _stub_torchvision()


# ---------------------------------------------------------------------------
# CPU rerouting
# ---------------------------------------------------------------------------

def patch_cuda_to_cpu(monkeypatch) -> None:
    """Reroute .cuda()/.to('cuda') to CPU (this image has CPU-only torch)."""
    import torch

    orig_to = torch.Tensor.to

    def _map(a):
        if isinstance(a, str) and a.startswith("cuda"):
            return "cpu"
        if isinstance(a, torch.device) and a.type == "cuda":
            return torch.device("cpu")
        return a

    def tensor_to(self, *args, **kwargs):
        args = tuple(_map(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = _map(kwargs["device"])
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(torch.Tensor, "to", tensor_to)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)


# ---------------------------------------------------------------------------
# reference import
# ---------------------------------------------------------------------------

def import_reference():
    """Import the reference modules needed by the eval-loop oracles."""
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    ns = types.SimpleNamespace()
    ns.config = importlib.import_module("engine.config.config")
    ns.metric = importlib.import_module("engine.utils.metrics.metric")
    ns.feature_extractor = importlib.import_module("data.utils.feature_extractor")
    ns.dataloader_utils = importlib.import_module("data.datasets.dataloader_utils")
    ns.loop_ucod = importlib.import_module("engine.runner.loop_UCOD_DPL")
    ns.loop_coral = importlib.import_module("engine.runner.loop_CORAL")
    ns.uscod = importlib.import_module("models.uscod")
    ns.UDLR = importlib.import_module("models.UDLR")
    return ns


# ---------------------------------------------------------------------------
# fakes for the runner plumbing around the loops
# ---------------------------------------------------------------------------

class FakeAccelerator:
    """Single-process stand-in: prepare/gather are identity on one process."""

    is_main_process = True

    def __init__(self):
        import torch

        self.device = torch.device("cpu")

    def prepare(self, *objs):
        return objs[0] if len(objs) == 1 else objs

    def gather_for_metrics(self, obj):
        return obj

    def wait_for_everyone(self):
        pass


class SilentLogger:
    def log(self, *a, **k):
        pass

    def warning(self, *a, **k):
        pass

    def error(self, *a, **k):
        pass

    def log_table(self, *a, **k):
        pass


class FakeRunner:
    """Duck-typed runner carrying exactly what the reference loops touch."""

    def __init__(self, model, val_dataloader, refiner=None):
        self.accelerator = FakeAccelerator()
        self.model = model
        self.val_dataloader = val_dataloader
        self.logger = SilentLogger()
        self.refiner = refiner


# ---------------------------------------------------------------------------
# shared tiny model builders
# ---------------------------------------------------------------------------

def build_shared_backbone(hidden=768, layers=2, heads=12, patch=14, image=56, seed=0):
    """(HF torch Dinov2Model, our params pytree, our DinoConfig) with
    identical weights."""
    import torch
    from transformers import Dinov2Config, Dinov2Model

    from ucod_dpl_tpu.models.dino import DinoConfig, convert_hf_state_dict

    torch.manual_seed(seed)
    hf_cfg = Dinov2Config(
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        patch_size=patch,
        image_size=image,
        output_attentions=True,
    )
    hf = Dinov2Model(hf_cfg).eval()
    sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
    import dataclasses

    our_cfg = dataclasses.replace(
        DinoConfig.dinov2_base(),
        hidden_size=hidden,
        num_layers=layers,
        num_heads=heads,
        patch_size=patch,
        image_size=image,
    )
    params = convert_hf_state_dict(sd, our_cfg)
    return hf, params, our_cfg


def build_shared_backbone_v1(hidden=768, layers=2, heads=12, patch=8, image=32, seed=0):
    """(HF torch ViTModel — the `facebook/dino-vitb8` architecture — our
    params pytree, our DinoConfig) with identical weights.

    ``image`` is the HF config's NATIVE pos-embed size; evaluating at a
    larger size exercises the ``interpolate_pos_encoding=True`` path the
    reference enables for DINOv1 (``data/utils/feature_extractor.py:49-55``,
    296px eval over 224px pretraining)."""
    import torch
    from transformers import ViTConfig, ViTModel

    from ucod_dpl_tpu.models.dino import DinoConfig, convert_hf_state_dict

    torch.manual_seed(seed)
    hf_cfg = ViTConfig(
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        intermediate_size=hidden * 4,
        patch_size=patch,
        image_size=image,
        output_attentions=True,
        attn_implementation="eager",
    )
    hf = ViTModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
    import dataclasses

    our_cfg = dataclasses.replace(
        DinoConfig.dinov1_vitb8(),
        hidden_size=hidden,
        num_layers=layers,
        num_heads=heads,
        patch_size=patch,
        image_size=image,
    )
    params = convert_hf_state_dict(sd, our_cfg)
    return hf, params, our_cfg


def confident_decoder_params(dim=768, seed=0, gain=4.0):
    """Random decoder params with boosted head weights: pushes sigmoid
    outputs away from the 0.5 threshold so float-noise between torch and JAX
    cannot flip binarised pixels."""
    import jax
    import jax.numpy as jnp

    from ucod_dpl_tpu.models.dba import init_rev_decoder

    p = init_rev_decoder(jax.random.PRNGKey(seed), dim)
    return p._replace(
        conv_out_fg_w=p.conv_out_fg_w * gain,
        conv_out_bg_w=p.conv_out_bg_w * gain,
        conv_out_fg_b=p.conv_out_fg_b + jnp.float32(0.1),
        conv_out_bg_b=p.conv_out_bg_b - jnp.float32(0.1),
    )


def suppressed_decoder_params(dim=768, seed=0, gain=4.0, bias=-8.0):
    """Decoder whose fg head is biased hard negative: every coarse logit is
    < 0 with a wide margin, so the CORAL ``_should_crop_center`` ratio
    ``(preds > 0).sum()/(h*w)`` is exactly 0 < 0.001 on both frameworks —
    deterministically forcing the centre-crop fallback branch
    (loop_CORAL.py:247-258)."""
    import jax.numpy as jnp

    p = confident_decoder_params(dim, seed, gain)
    return p._replace(conv_out_fg_b=p.conv_out_fg_b * 0 + jnp.float32(bias))


def confident_refiner_params(dim=768, seed=7, gain=8.0):
    """Refiner params with the GE fuser head scaled up: refined logits sit
    far from the 0.5-sigmoid threshold (and far outside [0, 1], keeping the
    ``process_preds`` already-probabilities predicate robustly False on both
    frameworks), so binarised masks cannot flip on cross-framework float
    noise."""
    import jax

    from ucod_dpl_tpu.models.udlr import init_sparse_refiner

    p = init_sparse_refiner(jax.random.PRNGKey(seed), dim=dim)
    p["ge"]["fuser2"] = {
        "w": p["ge"]["fuser2"]["w"] * gain,
        "b": p["ge"]["fuser2"]["b"] * gain,
    }
    return p


def center_logits_shift(logits: np.ndarray, q_lo=0.3, q_hi=0.7):
    """(shift, certified_gap): shift places the decision threshold at the
    midpoint of the LARGEST gap between consecutive sorted logits inside the
    [q_lo, q_hi] quantile band.  After shifting, roughly q_lo..q_hi of pixels
    are foreground (non-degenerate masks) and no logit lies closer to the
    threshold than gap/2 — a *certified* decision margin, orders of magnitude
    above cross-framework f32 drift, so binarised masks cannot flip."""
    s = np.sort(np.asarray(logits, np.float64).ravel())
    lo, hi = int(len(s) * q_lo), int(len(s) * q_hi)
    if hi - lo < 2:  # tiny oracles: widen to the full array (still >= 2)
        lo, hi = 0, len(s)
    if len(s) < 2:
        raise ValueError("center_logits_shift needs at least 2 logits")
    gaps = np.diff(s[lo:hi])
    i = int(np.argmax(gaps))
    mid = (s[lo + i] + s[lo + i + 1]) / 2.0
    return -float(mid), float(gaps[i])


def sharpen_decoder_fg(dec, shift: float, scale: float = 50.0):
    """Apply the centering shift to the fg head, then scale the head so the
    sigmoid saturates to exactly 0.0/1.0 in f32 away from the threshold:
    bilinear upsampling of saturated probabilities cannot manufacture new
    knife-edge 0.5-crossings from sub-ulp drift (the zero-crossing set is
    unchanged by positive scaling)."""
    import jax.numpy as jnp

    return dec._replace(
        conv_out_fg_w=dec.conv_out_fg_w * scale,
        conv_out_fg_b=(dec.conv_out_fg_b + jnp.float32(shift)) * scale,
    )


def sharpen_refiner_head(refiner, shift: float, scale: float = 50.0):
    """Same centering+saturation treatment for the refiner's GE fuser head
    (the final stage-2 logit producer)."""
    import copy

    p = copy.deepcopy(refiner)
    p["ge"]["fuser2"] = {
        "w": p["ge"]["fuser2"]["w"] * scale,
        "b": (p["ge"]["fuser2"]["b"] + shift) * scale,
    }
    return p


def assert_masks_bitexact(ref_dir: str, our_dir: str) -> None:
    """Saved binary masks must agree on EVERY pixel; on failure the flipped
    pixel coordinates are listed so drift is attributable, not averaged
    away."""
    names = sorted(os.listdir(ref_dir))
    assert names == sorted(os.listdir(our_dir)), (names, sorted(os.listdir(our_dir)))
    from PIL import Image

    nonconstant = 0
    for name in names:
        a = np.asarray(Image.open(os.path.join(ref_dir, name))) > 127
        b = np.asarray(Image.open(os.path.join(our_dir, name))) > 127
        assert a.shape == b.shape, (name, a.shape, b.shape)
        if a.size and (a.any() and not a.all()):
            nonconstant += 1
        if (a != b).any():
            ys, xs = np.nonzero(a != b)
            listing = ", ".join(f"({y},{x})" for y, x in list(zip(ys, xs))[:20])
            raise AssertionError(
                f"{name}: {len(ys)}/{a.size} flipped pixels at [{listing}"
                + (", ..." if len(ys) > 20 else "")
                + "] — composition drift; attribute it, do not widen the tolerance"
            )
    # degenerate oracles (all-constant masks) can't witness composition
    # drift; require real structure in the comparison set
    assert nonconstant >= 1, f"all {len(names)} masks constant — oracle too weak"


def make_synthetic_dataset(root, n=5, size=(80, 100), seed=0):
    """im/gt dirs with blobby images; masks include small + large objects so
    both LookTwice branches are exercised."""
    from PIL import Image

    im = os.path.join(root, "im")
    gt = os.path.join(root, "gt")
    os.makedirs(im, exist_ok=True)
    os.makedirs(gt, exist_ok=True)
    rng = np.random.default_rng(seed)
    h, w = size
    for i in range(n):
        base = rng.random((h, w, 3)) * 0.3
        yy, xx = np.mgrid[0:h, 0:w]
        cy, cx = rng.integers(20, h - 20), rng.integers(20, w - 20)
        r = 6 + 3 * i
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
        img = (np.clip(base + blob[..., None] * 0.6, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(im, f"img{i}.jpg"))
        Image.fromarray((blob * 255).astype(np.uint8)).save(
            os.path.join(gt, f"img{i}.png")
        )
