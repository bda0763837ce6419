"""tdrn_tpu — a TPU-native dual-refinement video object detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of SeanChenxy/TDRN
(see SURVEY.md): SSD-style multi-scale detection with an ARM→ODM anchor
refinement cascade and temporal feature propagation across video frames,
designed TPU-first (one jitted program per workload, static shapes, on-device
pre/post-processing, HBM-resident temporal state, named-mesh data parallelism).
"""

__version__ = "0.1.0"

from tdrn_tpu.config import (  # noqa: F401
    DetectorConfig,
    VOC_320,
    VOC_512,
    VID_320,
    VID_512,
    get_config,
)
