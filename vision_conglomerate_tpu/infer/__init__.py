from .runner import (  # noqa: F401
    load_detection_model,
    run_detection_inference,
)
