from . import boxes, nms, resize, heatmap, metrics, masks  # noqa: F401
