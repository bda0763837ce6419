"""Model zoo: backbones, refinement modules, and the TDRN detector (SURVEY.md L4)."""

from tdrn_tpu.models.detector import TDRN, build_detector  # noqa: F401
from tdrn_tpu.models.layers import L2Norm  # noqa: F401
from tdrn_tpu.models.temporal import init_state  # noqa: F401
from tdrn_tpu.models.resnet import ResNetBackbone  # noqa: F401
from tdrn_tpu.models.ssd import SSD, build_ssd, ssd_detect, ssd_detect_topk  # noqa: F401
from tdrn_tpu.models.vgg import VGG16Reduced  # noqa: F401
