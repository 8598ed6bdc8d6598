"""Data pipeline: folder datasets, crops, padding, device feeding."""

from .datasets import ImageFolderDataset, train_iterator
from .pad import pad_to_multiple, unpad

__all__ = ["ImageFolderDataset", "train_iterator", "pad_to_multiple", "unpad"]
