from .dataset import CODDataset, DataLoader, LRDataset
from .feature_extractor import FeatureExtractor
from .transforms import image_transform, label_transform, patch_transform

__all__ = [
    "CODDataset",
    "LRDataset",
    "DataLoader",
    "FeatureExtractor",
    "image_transform",
    "label_transform",
    "patch_transform",
]
