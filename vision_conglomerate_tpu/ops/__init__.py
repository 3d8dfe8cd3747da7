from . import boxes, nms, resize, heatmap, metrics, masks, postprocess, preprocess  # noqa: F401
