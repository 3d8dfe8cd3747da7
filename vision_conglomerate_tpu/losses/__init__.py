from .assigner import AssignResult, assign_targets_to_scale  # noqa: F401
from .focal import focal_loss_with_logits, bce_with_logits  # noqa: F401
from .detection_loss import DetectionLossConfig, detection_loss  # noqa: F401
from .segmentation_loss import SegmentationLossConfig, segmentation_loss  # noqa: F401
