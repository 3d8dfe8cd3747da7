"""Component registry.

The reference resolves backbone/neck/head classes by name through getattr
reflection (/root/reference/modules/detection.py:40-55). Here the same config
names map through an explicit registry, preserving the YAML schema
(`model_config.backbone: CSPBackBone` etc.) while keeping resolution
auditable and import-cycle free.

Each entry carries the module class and a static `out_channels` function so
models can be wired without initialising parameters.
"""
from typing import Any, Callable, Dict, NamedTuple, Optional, Sequence, Tuple

from .nn import backbones, blocks, necks


class ComponentSpec(NamedTuple):
    cls: Any
    # fn(in_channels, **config) -> out channels metadata (backbones take no
    # in_channels; necks take the backbone's 4-tuple)
    out_channels: Optional[Callable] = None
    config_key: Optional[str] = None  # defaults to f"{name.lower()}_config"


BACKBONES: Dict[str, ComponentSpec] = {
    "CSPBackBone": ComponentSpec(
        backbones.CSPBackBone,
        lambda **cfg: backbones.cspnet_out_channels(
            cfg.get("width_multiple", 0.5), cfg.get("early_min_channels")),
    ),
    "CSPNet": ComponentSpec(
        backbones.CSPNet,
        lambda **cfg: backbones.cspnet_out_channels(
            cfg.get("width_multiple", 0.5), cfg.get("early_min_channels")),
    ),
    "ResNetBackBone": ComponentSpec(
        backbones.ResNetBackBone,
        lambda **cfg: backbones.resnet_out_channels(cfg.get("block", "BasicBlock")),
    ),
}

NECKS: Dict[str, ComponentSpec] = {
    "RepBiPAN": ComponentSpec(necks.RepBiPAN, necks.repbipan_out_channels),
    "BiPAN": ComponentSpec(necks.BiPAN, necks.bipan_out_channels),
    "DeconvRepBiPAN": ComponentSpec(necks.DeconvRepBiPAN, necks.deconv_repbipan_out_channels),
    "DeconvBiPAN": ComponentSpec(necks.DeconvBiPAN, necks.deconv_bipan_out_channels),
}

HEADS: Dict[str, ComponentSpec] = {
    "EffiDecHead": ComponentSpec(blocks.EffiDecHead),
    "BasicHead": ComponentSpec(blocks.BasicHead),
}

# Encoder/decoder building blocks usable by the TrackNet "advanced" arch
# (reference modules/tracknet.py:80-131 resolves these from modules.common).
TRACKNET_MODULES: Dict[str, ComponentSpec] = {
    "CSPNet": BACKBONES["CSPNet"],
    "RepBiPAN": NECKS["RepBiPAN"],
    "BiPAN": NECKS["BiPAN"],
    "DeconvRepBiPAN": NECKS["DeconvRepBiPAN"],
    "DeconvBiPAN": NECKS["DeconvBiPAN"],
    "DeconvCSPNet": ComponentSpec(backbones.DeconvCSPNet),
}


def component_config(config: Dict[str, Any], name: str) -> Dict[str, Any]:
    """Reference config-key convention: `<name.lower()>_config` (detection.py:41)."""
    cfg = dict(config.get(name.lower() + "_config", {}) or {})
    return cfg


def resolve(table: Dict[str, ComponentSpec], name: str) -> ComponentSpec:
    if name not in table:
        raise KeyError(f"Unknown component {name!r}; available: {sorted(table)}")
    return table[name]
