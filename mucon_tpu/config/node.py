"""A minimal, self-contained hierarchical config system.

Mirrors the composition semantics the reference gets from yacs
(`/root/reference/src/core/config.py`, `src/train_test_mucon.py:17-27`):

* Python-defined defaults (a nested tree of typed leaves),
* yaml file overrides (``merge_from_file``),
* dotted inline overrides (``merge_from_list(["a.b.c", "1", ...])``),
* freeze/defrost, clone, and yaml round-trip (run folders snapshot their
  config as ``config.yaml`` and can be reloaded — `test_mucon.py:41-43`).

Implemented natively (no yacs dependency) so the framework is
self-describing and the config can be hashed for jit-cache keys.
"""

from __future__ import annotations

import copy
from typing import Any, List

import yaml

_VALID_LEAF_TYPES = (int, float, bool, str, type(None))


class ConfigNode(dict):
    """Nested attribute-accessible config dict with yacs-like semantics."""

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict: dict | None = None):
        super().__init__()
        self.__dict__[ConfigNode.IMMUTABLE] = False
        if init_dict:
            for k, v in init_dict.items():
                if isinstance(v, dict):
                    v = ConfigNode(v)
                self[k] = v

    # -- attribute access -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        if self.__dict__.get(ConfigNode.IMMUTABLE, False):
            raise AttributeError(
                f"Attempted to set '{name}' on an immutable ConfigNode"
            )
        self[name] = value

    def __setitem__(self, key: str, value: Any) -> None:
        if self.__dict__.get(ConfigNode.IMMUTABLE, False):
            raise AttributeError(
                f"Attempted to set '{key}' on an immutable ConfigNode"
            )
        super().__setitem__(key, value)

    # -- mutability --------------------------------------------------------
    def freeze(self) -> None:
        self._set_immutable(True)

    def defrost(self) -> None:
        self._set_immutable(False)

    def is_frozen(self) -> bool:
        return self.__dict__[ConfigNode.IMMUTABLE]

    def _set_immutable(self, value: bool) -> None:
        self.__dict__[ConfigNode.IMMUTABLE] = value
        for v in self.values():
            if isinstance(v, ConfigNode):
                v._set_immutable(value)

    # -- composition ---------------------------------------------------------
    def clone(self) -> "ConfigNode":
        out = copy.deepcopy(self)
        out.defrost()
        return out

    def merge_from_other(self, other: "ConfigNode") -> None:
        _merge_into(other, self, [])

    def merge_from_file(self, filename: str) -> None:
        with open(filename) as f:
            loaded = yaml.safe_load(f)
        if loaded is None:
            return
        _merge_into(ConfigNode(loaded), self, [])

    def merge_from_list(self, opts: List[str]) -> None:
        """Merge from a flat list of dotted key / value string pairs."""
        if len(opts) % 2 != 0:
            raise ValueError(f"Override list must have even length, got {opts}")
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node:
                    raise KeyError(f"Non-existent config key: {key}")
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"Non-existent config key: {key}")
            old = node[leaf]
            node[leaf] = _coerce(value, old, key)

    # -- serialization ---------------------------------------------------------
    def to_dict(self) -> dict:
        out = {}
        for k, v in self.items():
            out[k] = v.to_dict() if isinstance(v, ConfigNode) else v
        return out

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), default_flow_style=False)

    def dump_to_file(self, filename: str) -> None:
        with open(filename, "w") as f:
            f.write(self.dump())

    def __str__(self) -> str:  # readable nested rendering
        def _render(node: "ConfigNode", indent: int) -> str:
            lines = []
            for k in sorted(node.keys()):
                v = node[k]
                if isinstance(v, ConfigNode):
                    lines.append(" " * indent + f"{k}:")
                    lines.append(_render(v, indent + 2))
                else:
                    lines.append(" " * indent + f"{k}: {v!r}")
            return "\n".join(lines)

        return _render(self, 0)

    def __repr__(self) -> str:
        return f"ConfigNode({super().__repr__()})"

    def __deepcopy__(self, memo):
        out = ConfigNode()
        memo[id(self)] = out
        for k, v in self.items():
            dict.__setitem__(out, k, copy.deepcopy(v, memo))
        out.__dict__[ConfigNode.IMMUTABLE] = self.__dict__[ConfigNode.IMMUTABLE]
        return out


def _merge_into(src: ConfigNode, dst: ConfigNode, path: List[str]) -> None:
    for k, v in src.items():
        full = ".".join(path + [k])
        if k not in dst:
            raise KeyError(f"Non-existent config key: {full}")
        if isinstance(dst[k], ConfigNode):
            if not isinstance(v, ConfigNode):
                raise TypeError(f"Cannot overwrite subtree {full} with a leaf")
            _merge_into(v, dst[k], path + [k])
        else:
            dst[k] = _coerce(v, dst[k], full)


def _coerce(value: Any, old: Any, key: str) -> Any:
    """Coerce an override value to the type of the existing leaf."""
    if isinstance(value, str):
        if value.strip() == "" and isinstance(old, str):
            return value  # yaml parses "" as None; keep string leaves ""
        try:
            value = yaml.safe_load(value)
        except yaml.YAMLError:
            pass
    if old is None or value is None:
        return value
    if isinstance(old, bool):
        if isinstance(value, bool):
            return value
        if isinstance(value, str):
            if value.lower() in ("true", "1", "yes"):
                return True
            if value.lower() in ("false", "0", "no"):
                return False
        if isinstance(value, int):
            return bool(value)
        raise TypeError(f"Cannot coerce {value!r} to bool for key {key}")
    if isinstance(old, float) and isinstance(value, int):
        return float(value)
    if isinstance(old, (list, tuple)):
        if not isinstance(value, (list, tuple)):
            raise TypeError(f"Cannot coerce {value!r} to list for key {key}")
        return list(value)
    if old == "auto" and isinstance(value, (bool, int)):
        # tri-state/auto leaves ("auto" | literal), e.g. tpu.use_pallas
        # ("auto"|True|False) and tpu.scan_unroll ("auto"|int). Only the
        # "auto" sentinel admits a non-string; other string leaves keep
        # the strict type check (e.g. `--set dataset.name True` must fail).
        return value
    if type(old) is not type(value):
        if isinstance(old, _VALID_LEAF_TYPES) and isinstance(
            value, _VALID_LEAF_TYPES
        ):
            raise TypeError(
                f"Type mismatch for key {key}: {type(old).__name__} vs "
                f"{type(value).__name__} ({value!r})"
            )
    return value


def update_config(
    default_config: ConfigNode,
    file_configs: List[str] = (),
    set_configs: List[str] = (),
) -> ConfigNode:
    """Compose defaults <- yaml files <- dotted overrides, then freeze.

    Mirrors fandak's ``update_config`` call-site contract
    (`/root/reference/src/train_test_mucon.py:19-22`).
    """
    cfg = default_config.clone()
    for f in file_configs:
        cfg.merge_from_file(f)
    if set_configs:
        cfg.merge_from_list(list(set_configs))
    cfg.freeze()
    return cfg
