from .runner import (  # noqa: F401
    load_detection_model,
    run_detection_inference,
)
from .tracknet_runner import (  # noqa: F401
    load_tracknet_model,
    run_tracknet_inference,
)
