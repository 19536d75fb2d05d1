"""Host-side image preprocessing (PIL + NumPy, NHWC outputs).

Behavioral equivalents of the reference's torchvision pipelines
(``data/datasets/transforms.py:8-43``): PIL bilinear resize, scale to [0,1],
ImageNet normalisation.  Outputs are HWC float32 numpy arrays ready to be
batched into NHWC device arrays.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def _resize_pil(img: Image.Image, size_hw: Tuple[int, int]) -> Image.Image:
    h, w = size_hw
    return img.resize((w, h), Image.BILINEAR)


def to_array(img: Image.Image) -> np.ndarray:
    """ToTensor equivalent: HWC float32 in [0, 1]."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def image_transform(img: Image.Image, size_hw: Optional[Tuple[int, int]]) -> np.ndarray:
    """Resize (optional) + ToTensor + ImageNet-normalise -> (H, W, 3)."""
    if size_hw is not None:
        img = _resize_pil(img, size_hw)
    arr = to_array(img)
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def label_transform(
    img: Image.Image, size_hw: Tuple[int, int], keep_size: bool = False
) -> np.ndarray:
    """Grayscale label -> (H, W, 1) float in [0,1]; resize unless keep_size."""
    if not keep_size:
        img = _resize_pil(img, size_hw)
    return to_array(img)


def patch_transform(img: Image.Image) -> np.ndarray:
    """ToTensor + normalise without resizing (LR patch pipeline)."""
    return image_transform(img, None)
