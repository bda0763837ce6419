"""Datasets + augmentation (the reference's L2/L3 layers, SURVEY.md §1)."""

from tdrn_tpu.data.augment import BaseTransform, SSDAugmentation  # noqa: F401
from tdrn_tpu.data.voc import (  # noqa: F401
    VOC_CLASSES,
    VOCDetection,
    collate_batch,
    pad_targets,
    parse_voc_xml,
)
from tdrn_tpu.data.vid import (  # noqa: F401
    VID_CLASSES,
    VIDDetection,
    collate_clips,
    parse_vid_xml,
)
