"""Evaluation: VOC/VID mAP protocol (the reference's eval.py layer, SURVEY.md §2 #22/#23)."""

from tdrn_tpu.eval.voc_eval import (  # noqa: F401
    eval_class,
    evaluate_detections,
    voc_ap,
    write_voc_results_files,
)
