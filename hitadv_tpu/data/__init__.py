"""Data layer (L0): loaders, augmentations, synthetic fixtures."""

from hitadv_tpu.data.synthetic import synthetic_batches, synthetic_clouds  # noqa: F401
