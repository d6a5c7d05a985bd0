from . import readers, preprocess, rasterizer, augment  # noqa: F401
from .dataset import SfMDataset, BatchLoader, collate, generating_pos_and_increment  # noqa: F401
