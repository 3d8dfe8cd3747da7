from .yaml_io import load_yaml, save_yaml  # noqa: F401
from . import labels, image, drawing  # noqa: F401
