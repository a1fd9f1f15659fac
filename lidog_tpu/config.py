"""YAML config system — attribute-tree compatible with the reference YAMLs.

Reference: configs/config.py:4-17 (`get_config` -> recursive dict->attribute
tree; lists of dicts become lists of Configs).  The 40 shipped experiment
YAMLs (configs/<method>/{single,multi}/*.yaml) load unchanged.  Added here
(absent in the reference): `get(key, default)` access and a `to_dict`
round-trip for checkpoint metadata.
"""

from __future__ import annotations

from typing import Any, Dict

import yaml


class Config:
    def __init__(self, d: Dict[str, Any]):
        self._raw = d
        for k, v in d.items():
            if isinstance(v, dict):
                v = Config(v)
            elif isinstance(v, list):
                v = [Config(x) if isinstance(x, dict) else x for x in v]
            setattr(self, k, v)

    def get(self, key: str, default=None):
        return getattr(self, key, default)

    def to_dict(self) -> Dict[str, Any]:
        return self._raw

    def __repr__(self) -> str:
        return f"Config({self._raw!r})"


def get_config(path: str) -> Config:
    with open(path) as f:
        return Config(yaml.safe_load(f))
