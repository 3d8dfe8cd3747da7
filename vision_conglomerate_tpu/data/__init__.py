from .detection import DetectionDataset  # noqa: F401
from .segmentation import SegmentationDataset  # noqa: F401
from .tracknet import TrackNetDataset  # noqa: F401
from .loader import DataLoader, prefetch_to_device  # noqa: F401
from .inference import (  # noqa: F401
    SingleImgSample,
    InferenceImgDataset,
    InferenceVideoDataset,
    TrackNetInferenceImgDataset,
    TrackNetInferenceVideoDataset,
)
