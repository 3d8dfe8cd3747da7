"""YAML config IO (reference utils/utils.py:14-18; the YAML schema of
config/<task>/{config,anchors}.yaml is this framework's public API too)."""
from typing import Any, Dict

import yaml


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def save_yaml(obj: Dict[str, Any], path: str, **kwargs):
    with open(path, "w") as f:
        yaml.safe_dump(obj, f, **kwargs)
