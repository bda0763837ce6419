"""Shared test helpers: tiny detector variants sized for fast CPU compiles."""

from tdrn_tpu.config import TINY_64
from tdrn_tpu.models import build_detector

TCB_TEST_CHANNELS = 32


def tiny_detector(temporal: bool = True):
    return build_detector(
        TINY_64, temporal=temporal, tcb_channels=TCB_TEST_CHANNELS, width_mult=0.125
    )
