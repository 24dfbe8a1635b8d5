from change3d_tpu.metrics.confusion import (
    confusion_matrix,
    binary_change_scores,
    scd_scores,
    bda_scores,
    BinaryChangeMeter,
    SCDMeter,
    BDAMeter,
)

__all__ = [
    "confusion_matrix",
    "binary_change_scores",
    "scd_scores",
    "bda_scores",
    "BinaryChangeMeter",
    "SCDMeter",
    "BDAMeter",
]
