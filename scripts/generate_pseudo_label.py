"""Pseudo-label generation CLI (counterpart of generate_pseudo_label.py).

DINOv2-base at 224px over the training images; background segmentation from
the last layer's CLS attention + key cosine similarity; small-component
cleanup; dumped to the pseudo-label cache layout the datasets read.

TPU-first: images run through the backbone in batches (the reference is
strictly image-at-a-time on whatever device torch defaults to), and the
full background-mask math executes as one XLA program per batch.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="Generate pseudo labels for COD datasets")
    parser.add_argument("--dataset", type=str, default="TR-CAMO+TR-COD10K",
                        help="Dataset name(s), '+'-joined")
    parser.add_argument("--image_path", type=str, default="./datasets/RefCOD/{}/im",
                        help="Template path for images ({} = dataset name)")
    parser.add_argument("--cache_path", type=str, default="./datasets/cache/pseudo_label_cache/",
                        help="Cache output root")
    parser.add_argument("--backbone_weights", type=str, default="./weights",
                        help="Local HuggingFace weight dir for facebook/dinov2-base")
    parser.add_argument("--th_bkg", type=float, default=0.6)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--fe_type", type=str, default="dinov2", choices=["dinov1", "dinov2"])
    parser.add_argument("--overwrite", action="store_true",
                        help="Regenerate even if a complete cache exists "
                             "(e.g. after changing --th_bkg)")
    args = parser.parse_args()

    import numpy as np

    from ucod_dpl_tpu.config import CfgNode
    from ucod_dpl_tpu.data.feature_extractor import FeatureExtractor
    from ucod_dpl_tpu.data.transforms import image_transform
    from ucod_dpl_tpu.ops.pseudo_label import (
        compute_background_mask,
        refine_small_components,
    )
    from ucod_dpl_tpu.utils.fileio import ArrayCache, ImageIO
    from ucod_dpl_tpu.utils import get_logger

    logger = get_logger()
    fe = FeatureExtractor(
        CfgNode(
            {
                "type": args.fe_type,
                "backbone": "facebook/dinov2-base" if args.fe_type == "dinov2" else "facebook/dino-vitb8",
                "backbone_weights": args.backbone_weights,
            }
        )
    )

    image_paths = []
    for dataset in args.dataset.split("+"):
        dir_path = args.image_path.format(dataset)
        if not os.path.exists(dir_path):
            raise ValueError(f"Image path {dir_path} does not exist!")
        image_paths += ImageIO.list_dir_image(dir_path)
    image_paths = sorted(image_paths)
    logger.log(f"Found {len(image_paths)} images from {args.dataset}.")

    cache = ArrayCache(os.path.join(args.cache_path, args.dataset))
    if cache.mode == "r":
        # a complete cache opens read-only; without this the first write
        # below would raise an opaque "not in write mode" AFTER the backbone
        # warmed up — decide up front instead
        if not args.overwrite:
            logger.log(
                f"Pseudo-label cache at {cache.base_path} is already complete "
                f"({len(cache)} entries); pass --overwrite to regenerate "
                "(required after changing --th_bkg or the image set)"
            )
            return
        cache.invalidate("--overwrite requested")
    size = (args.image_size, args.image_size)
    grid = args.image_size // fe.config.patch_size

    idx = 0
    for start in range(0, len(image_paths), args.batch_size):
        chunk = image_paths[start : start + args.batch_size]
        batch = np.stack(
            [image_transform(ImageIO.read_image(p, "RGB"), size) for p in chunk]
        )
        key_tokens, _, cls_attn = fe.extract_with_attention(batch)
        bkg, _ = compute_background_mask(
            cls_attn, key_tokens, (grid, grid), th_bkg=args.th_bkg
        )
        fg = 1.0 - np.asarray(bkg)  # (B, h, w), 1 on candidate foreground
        for m in fg:
            refined = refine_small_components(m)
            cache.write(idx, refined[:, :, None].astype(np.float32))
            idx += 1
        if (start // args.batch_size) % 10 == 0:
            logger.log(f"pseudo-labels: {idx}/{len(image_paths)}")
    import hashlib

    stems = "\n".join(os.path.splitext(os.path.basename(str(p)))[0] for p in image_paths)
    cache.flush(
        meta={
            "n": idx,
            # same identity scheme as CODDataset._cache_identity: lets the
            # trainer invalidate this positional cache when the image set
            # changes underneath it
            "fingerprint": hashlib.sha1(stems.encode()).hexdigest(),
            "th_bkg": args.th_bkg,
        }
    )
    logger.log(f"Generated {idx} pseudo labels into {cache.base_path}")


if __name__ == "__main__":
    main()
