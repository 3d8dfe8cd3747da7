from .detection import DetectionNet, decode_scale, make_2dgrid, rescale_preds_to_size  # noqa: F401
from .segmentation import SegmentationNet  # noqa: F401
from .tracknet import TrackNet  # noqa: F401
