from lidog_tpu.metrics.metrics import (  # noqa: F401
    confusion_matrix,
    iou_from_confusion,
    jaccard_per_class,
    mean_iou,
)
