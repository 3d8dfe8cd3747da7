from .make_anchors import (  # noqa: F401
    ratio_metrics,
    ratio_metrics_w_extras,
    cluster_anchors_w_mutation,
    generate_anchors_and_class_weights,
)
from .bytetrack import ByteTrack, Detections  # noqa: F401
