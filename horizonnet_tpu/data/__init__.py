"""Data pipeline: dataset index, GT label synthesis, device augmentation.

Reference behavior: dataset.py (PanoCorBonDataset) + misc/panostretch.py.
TPU-first split: corner/label math stays on host (tiny 1D arrays); ALL
image-side work — pano-stretch resampling, flip, roll, gamma — fuses into a
single batched gather+pow kernel on device (the reference spends most of its
dataloader time in per-sample scipy map_coordinates on host, SURVEY.md §3.3).
"""

from .labels import find_occlusion, cor2xybound, corner_heatmap, stretched_corners
from .dataset import PanoCorBonDataset
from .augment import batched_augment_images, sample_aug_params, augment_batch

__all__ = [
    "find_occlusion", "cor2xybound", "corner_heatmap", "stretched_corners",
    "PanoCorBonDataset",
    "batched_augment_images", "sample_aug_params", "augment_batch",
]
