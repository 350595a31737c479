"""Data layer (L0): loaders, augmentations, synthetic fixtures."""

from hitadv_tpu.data.synthetic import synthetic_batches, synthetic_clouds  # noqa: F401
from hitadv_tpu.data.loader import batch_iterator, device_put_batches  # noqa: F401
from hitadv_tpu.data.modelnet import (  # noqa: F401
    MODELNET40_CLASSES,
    ModelNet40H5,
    ModelNetDataset,
    fps_numpy,
    load_h5_cls,
    pc_normalize,
)
from hitadv_tpu.data.shapenet import PartNormalDataset  # noqa: F401
from hitadv_tpu.data.geoa3_mat import (  # noqa: F401
    TEN_LABEL_INDEXES,
    TEN_LABEL_NAMES,
    GeoA3ModelNet40,
)
from hitadv_tpu.data import provider  # noqa: F401
from hitadv_tpu.data.extra_h5 import (  # noqa: F401,E402
    S3DISH5,
    ScanNetBlocks,
    ShapeNetPartH5,
    load_data_partseg,
    load_data_semseg,
)
