"""Host-side image preprocessing (native C++ fast path + PIL fallback, NHWC).

Behavioral equivalents of the reference's torchvision pipelines
(``data/datasets/transforms.py:8-43``): PIL bilinear resize, scale to [0,1],
ImageNet normalisation.  Outputs are HWC float32 numpy arrays ready to be
batched into NHWC device arrays.

The hot operations (decode, resize, normalise) are served by the native
image pipeline in ``native/imagepipe.cpp`` when it is available — the resize
there reimplements Pillow's BILINEAR resampling bit-exactly (same fixed-point
coefficients, same clip semantics, verified in ``tests/test_native_io.py``),
so the fast path and the PIL fallback produce identical bytes.  DECODE
parity additionally rests on the system libjpeg/libpng matching what Pillow
bundles, so ``utils.native`` probes decode parity once per process and
disables the native decode (keeping the native resize) on hosts where it
differs — the identical-bytes contract holds either way.  Set
``UCOD_NATIVE_IO=0`` to force the pure-PIL path.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ucod_dpl_tpu.utils import native

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def _resize_pil(img: Image.Image, size_hw: Tuple[int, int]) -> Image.Image:
    h, w = size_hw
    return img.resize((w, h), Image.BILINEAR)


def resize_bilinear(img, size_hw: Tuple[int, int]) -> np.ndarray:
    """Pillow-BILINEAR resize of a PIL image or uint8 HW[C] array -> uint8
    array.  Uses the native kernel when available (bit-exact vs Pillow).

    Palette ("P") and bilevel ("1") images stay on the PIL path: their numpy
    view is palette indices / booleans, and Pillow resamples those modes with
    NEAREST regardless of the requested filter — interpolating the raw values
    would be wrong."""
    if isinstance(img, Image.Image) and img.mode not in ("L", "RGB", "RGBA"):
        return np.asarray(_resize_pil(img, size_hw))
    arr = np.asarray(img)
    if arr.dtype == np.uint8:
        out = native.resize_u8_native(arr, size_hw)
        if out is not None:
            return out
    if not isinstance(img, Image.Image):
        img = Image.fromarray(img)
    return np.asarray(_resize_pil(img, size_hw))


def to_array(img) -> np.ndarray:
    """ToTensor equivalent: HWC float32 in [0, 1].  Accepts PIL or ndarray."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def image_transform(img, size_hw: Optional[Tuple[int, int]]) -> np.ndarray:
    """Resize (optional) + ToTensor + ImageNet-normalise -> (H, W, 3)."""
    if size_hw is not None:
        img = resize_bilinear(img, size_hw)
    arr = to_array(img)
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def label_transform(img, size_hw: Tuple[int, int], keep_size: bool = False) -> np.ndarray:
    """Grayscale label -> (H, W, 1) float in [0,1]; resize unless keep_size."""
    if not keep_size:
        img = resize_bilinear(img, size_hw)
    return to_array(img)


def patch_transform(img) -> np.ndarray:
    """ToTensor + normalise without resizing (LR patch pipeline)."""
    return image_transform(img, None)


# ---------------------------------------------------------------------------
# Path-based loaders: native decode+resize+normalise with PIL fallback.
# ---------------------------------------------------------------------------


def _pil_load_image(path, size_hw: Optional[Tuple[int, int]]) -> np.ndarray:
    from ucod_dpl_tpu.utils.fileio import ImageIO

    return image_transform(ImageIO.read_image(path, "RGB"), size_hw)


def load_image_transform(path, size_hw: Optional[Tuple[int, int]]) -> np.ndarray:
    """Decode + resize + normalise one image file -> (H, W, 3) float32.

    Native decode handles baseline JPEG/PNG; exotic containers (CMYK JPEG,
    16-bit PNG, webp, ...) fall back to PIL with identical output."""
    if size_hw is not None:
        arr = native.load_image_u8(path, "RGB", size_hw)
        if arr is not None:
            return (to_array(arr) - IMAGENET_MEAN) / IMAGENET_STD
    return _pil_load_image(path, size_hw)


def load_image_batch_transform(
    paths: Sequence, size_hw: Tuple[int, int], nthreads: int = 0
) -> np.ndarray:
    """Decode + resize + normalise a batch of image files -> (N, H, W, 3)
    float32 in one threaded native call (no GIL); per-image PIL fallback when
    the native pipeline is unavailable or any image is unsupported."""
    out = native.load_norm_batch_native(
        paths, size_hw, IMAGENET_MEAN, IMAGENET_STD, nthreads=nthreads
    )
    if out is not None:
        return out
    return np.stack([_pil_load_image(p, size_hw) for p in paths])


def load_label_transform(
    path, size_hw: Tuple[int, int], keep_size: bool = False
) -> np.ndarray:
    """Decode a grayscale label file -> (H, W, 1) float32 in [0, 1]."""
    arr = native.load_image_u8(path, "L", None if keep_size else size_hw)
    if arr is not None:
        return to_array(arr)
    from ucod_dpl_tpu.utils.fileio import ImageIO

    return label_transform(ImageIO.read_image(path, "L"), size_hw, keep_size=keep_size)
