"""Batched inference API for production serving.

The reference offers only dataset-driven eval scripts; deployments need a
load-once / predict-many surface. ``Predictor`` wraps backbone + decoder
(+ optional LookTwice refinement) behind one call:

    from ucod_dpl_tpu.serving import Predictor
    p = Predictor.from_config("configs/uscod/UCOD-DPL_dinov2.py",
                              checkpoint="weights/UCOD_DPL_dinov2.safetensors")
    masks = p.predict(["im1.jpg", "im2.jpg"])   # list of (H, W) float masks

Design: one jitted pixels->mask program per batch bucket (powers of two up to
``max_batch``), bf16 on TPU, uint8 mask readback, optional per-image
LookTwice second pass reusing the eval-loop machinery.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ucod_dpl_tpu.data.feature_extractor import FeatureExtractor
from ucod_dpl_tpu.data.transforms import image_transform
from ucod_dpl_tpu.models.dba import RevDecoderParams, fg_logits_live
from ucod_dpl_tpu.models.safetensors_io import load_decoder_checkpoint
from ucod_dpl_tpu.ops.resize import interpolate_bilinear_nhwc, interpolate_bilinear_np
from ucod_dpl_tpu.utils.fileio import ImageIO


class Predictor:
    """Load-once, predict-many camouflaged-object segmentation."""

    def __init__(
        self,
        feature_extractor: FeatureExtractor,
        decoder_params: RevDecoderParams,
        image_size=(518, 518),
        feature_size: int = 68,
        max_batch: int = 16,
        look_twice_th: float = 0.15,
        expand_type: str = "dynamic",
        quantize: Optional[str] = None,
    ):
        self.fe = feature_extractor
        self.decoder_params = decoder_params
        self.image_size = tuple(image_size)
        self.feature_size = feature_size
        self.max_batch = max_batch
        self.look_twice_th = look_twice_th
        self.expand_type = expand_type

        # opt-in int8 W8A8 backbone (ops/quant.py): the transformer linears
        # take the MXU's 2x int8 mode; quantized ONCE here, passed alongside
        # the full params (norms/embeddings still read from those)
        if quantize not in (None, "int8"):
            raise ValueError(f"quantize must be None or 'int8', got {quantize!r}")
        self.quantize = quantize
        self._qparams = None
        if quantize == "int8":
            from ucod_dpl_tpu.ops.quant import quantize_dino_linears

            self._qparams = jax.jit(quantize_dino_linears)(feature_extractor.params)

        fs = self.feature_size

        @jax.jit
        def pixels_to_probs(backbone_params, decoder_params, pixels, qparams):
            # key-fold fast path: decoupling folded into the last layer's
            # key projection (models/dba.py::fg_logits_live)
            fg, _, _ = fg_logits_live(
                backbone_params, decoder_params, pixels, self.fe.config,
                compute_dtype=self.fe.compute_dtype, size=fs, quant=qparams,
            )
            up = interpolate_bilinear_nhwc(fg, self.image_size)[..., 0]
            return jax.nn.sigmoid(up)

        @jax.jit
        def pixels_to_mask(backbone_params, decoder_params, pixels, qparams):
            return (
                pixels_to_probs(backbone_params, decoder_params, pixels, qparams) > 0.5
            ).astype(jnp.uint8)

        @jax.jit
        def crop_pass(backbone_params, decoder_params, pixels, qparams):
            # LookTwice second pass: masks at the crop's key-feature
            # resolution, matching the eval loop (loop_UCOD_DPL.py:343-348)
            fg, _, _ = fg_logits_live(
                backbone_params, decoder_params, pixels, self.fe.config,
                compute_dtype=self.fe.compute_dtype, quant=qparams,
            )
            return (jax.nn.sigmoid(fg[..., 0]) > 0.5).astype(jnp.float32)

        self._pixels_to_probs = pixels_to_probs
        self._pixels_to_mask = pixels_to_mask
        self._crop_pass = crop_pass

    @classmethod
    def from_config(
        cls,
        config_path: str,
        checkpoint: str,
        max_batch: int = 16,
        strict: bool = True,
        quantize: Optional[str] = None,
    ) -> "Predictor":
        """``strict=True`` (default): missing backbone weights raise instead
        of silently serving random-init features.  ``quantize="int8"``:
        int8 W8A8 backbone (2x MXU rate; see ops/quant.py for the accuracy
        contract)."""
        from ucod_dpl_tpu.config import load_config

        cfg = load_config(config_path)
        fe = FeatureExtractor(cfg.dataset_cfg.feature_extractor_cfg, strict=strict)
        decoder, _ema = load_decoder_checkpoint(checkpoint)
        return cls(
            fe,
            decoder,
            image_size=tuple(cfg.dataset_cfg.valset_cfg.get("image_size", (518, 518))),
            feature_size=cfg.model_cfg.feature_size,
            max_batch=max_batch,
            look_twice_th=cfg.val_cfg.get("look_twice_th", 0.15),
            expand_type=cfg.val_cfg.get("expand_type", "dynamic"),
            quantize=quantize,
        )

    def _bucket(self, n: int) -> int:
        b = 1
        while b < n and b < self.max_batch:
            b *= 2
        return min(b, self.max_batch)

    def _load(self, item):
        """-> (normalised (H, W, 3) float array, original PIL image or None)."""
        from PIL import Image

        if isinstance(item, (str,)) or hasattr(item, "__fspath__"):
            img = ImageIO.read_image(item, "RGB")
            return image_transform(img, self.image_size), img
        arr = np.asarray(item)
        if arr.ndim == 3 and arr.dtype == np.uint8:  # raw RGB image
            img = Image.fromarray(arr)
            return image_transform(img, self.image_size), img
        return arr, None  # already transformed (H, W, 3) float

    def predict(
        self,
        inputs: Sequence[Union[str, np.ndarray]],
        output_size: Optional[tuple] = None,
        look_twice: bool = False,
        soft: bool = False,
    ) -> List[np.ndarray]:
        """Images (paths, uint8 RGB arrays, or pre-normalised arrays) ->
        (H, W) float32 masks at ``output_size`` (default: the model's
        image_size).

        ``look_twice=True``: small predicted objects trigger the zoom-in
        second pass (connected components -> bbox expansion -> batched crop
        re-inference, same machinery as the eval loop).  Requires inputs
        with an original image (paths or uint8 arrays).
        ``soft=True``: return sigmoid probabilities instead of {0,1} masks
        (mutually exclusive with look_twice, which is defined on binaries).
        """
        import os as _os

        if look_twice and soft:
            raise ValueError("look_twice refines binary masks; soft=True is incompatible")
        # a bare path or a single (H, W, 3) image is one input, not a
        # sequence — iterating a string's characters or an image's rows
        # would silently produce garbage masks
        if isinstance(inputs, (str, _os.PathLike)):
            inputs = [inputs]
        elif isinstance(inputs, np.ndarray):
            if inputs.ndim == 3:
                inputs = [inputs]
            elif inputs.ndim != 4:
                raise ValueError(
                    f"array input must be (H, W, 3) or (N, H, W, 3); got {inputs.shape}"
                )
        inputs = list(inputs)
        program = self._pixels_to_probs if soft else self._pixels_to_mask
        if look_twice:
            from ucod_dpl_tpu.engine.eval_loop import find_refine_bboxes, refine_with_crops

            def crop_fn(batch):
                return self._crop_pass(
                    self.fe.params, self.decoder_params, batch, self._qparams
                )

        masks: List[np.ndarray] = []
        i = 0
        while i < len(inputs):
            # decode/transform PER CHUNK: eager whole-list loading holds
            # every full-res original + normalised array alive at once
            # (~3MB+ per image — a 10k-image call would OOM the host)
            take = min(self.max_batch, len(inputs) - i)
            loaded = [self._load(x) for x in inputs[i : i + take]]
            arrays = [a for a, _ in loaded]
            originals = [im for _, im in loaded] if look_twice else None
            if look_twice and any(im is None for im in originals):
                raise ValueError(
                    "look_twice needs the original image: pass paths or uint8 RGB arrays"
                )
            nb = self._bucket(take)
            batch = np.zeros((nb, *self.image_size, 3), np.float32)
            for j, a in enumerate(arrays):
                if np.shape(a) != (*self.image_size, 3):
                    raise ValueError(
                        f"input {i + j}: expected a path, a uint8 RGB image, or a "
                        f"pre-normalised {(*self.image_size, 3)} float array; got "
                        f"shape {np.shape(a)}"
                    )
                batch[j] = a
            out = np.asarray(
                program(self.fe.params, self.decoder_params, batch, self._qparams)
            )[:take]
            chunk = [m.astype(np.float32) for m in out]
            if look_twice:
                for k, (mask, img) in enumerate(zip(chunk, originals)):
                    bboxes = find_refine_bboxes(
                        mask, self.image_size, self.look_twice_th, self.expand_type
                    )
                    if bboxes is not None:
                        chunk[k] = refine_with_crops(
                            img, bboxes, mask, self.image_size, crop_fn
                        )
            masks.extend(chunk)
            i += take

        if output_size is not None:
            if soft:
                masks = [interpolate_bilinear_np(m, output_size) for m in masks]
            else:
                masks = [
                    (interpolate_bilinear_np(m, output_size) > 0.5).astype(np.float32)
                    for m in masks
                ]
        return masks
