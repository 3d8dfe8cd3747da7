from .state import TrainState  # noqa: F401
from .base import resolve_remat_default  # noqa: F401
from .lr_schedule import CosineAnnealingWarmRestarts, make_lr_scheduler  # noqa: F401
from .optim import make_optimizer  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from .detection_trainer import TrainDetectionPipeline  # noqa: F401
from .segmentation_trainer import TrainSegmentationPipeline  # noqa: F401
from .tracknet_trainer import TrainTrackNetPipeline  # noqa: F401
