from . import blocks, backbones, necks, reparam, initializers  # noqa: F401
