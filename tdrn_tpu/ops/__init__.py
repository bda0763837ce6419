"""Geometry + post-processing ops (the reference's L0/L1/L6 layers, SURVEY.md §1)."""

from tdrn_tpu.ops.boxes import (  # noqa: F401
    point_form,
    center_size,
    intersect,
    iou,
    jaccard,
    encode,
    decode,
)
from tdrn_tpu.ops.priors import prior_boxes, prior_boxes_np  # noqa: F401
from tdrn_tpu.ops.matching import match, match_batch, MatchResult  # noqa: F401
from tdrn_tpu.ops.nms import (  # noqa: F401
    nms_fixed,
    class_aware_nms,
    flatten_detections,
    NMSResult,
    TopDetections,
)
from tdrn_tpu.ops.detection import (  # noqa: F401
    RawPredictions,
    decode_two_stage,
    detect,
    detect_topk,
)
from tdrn_tpu.ops.preprocess import (  # noqa: F401
    preprocess_frame,
    preprocess_batch,
    scale_boxes_to_pixels,
)
