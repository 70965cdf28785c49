"""Attribute-accessible config tree (OmegaConf-DictConfig work-alike)."""

from __future__ import annotations

import copy
import datetime
import re
from typing import Any, Iterator

MISSING = "???"


class MissingMandatoryValue(Exception):
    """Raised when a ``???`` value is accessed without being provided."""


class Config(dict):
    """A dict with attribute access, deep merge, and ``???`` semantics.

    Mirrors the slice of OmegaConf the reference relies on
    (reference: configs/train_ocr.yaml:1-7 mandatory groups,
    ocrs/multiple_cnns/multiple_cnn_module.py:21-23 open_dict mutation).
    """

    def __getattr__(self, key: str) -> Any:
        try:
            value = self[key]
        except KeyError:
            raise AttributeError(key) from None
        if value == MISSING:
            raise MissingMandatoryValue(
                f"Mandatory value '{key}' is missing: provide it via the CLI "
                f"(e.g. `{key}=<name>`)"
            )
        return value

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = _wrap(value)

    def __delattr__(self, key: str) -> None:
        try:
            del self[key]
        except KeyError:
            raise AttributeError(key) from None

    # -- dict-style get also honours MISSING ---------------------------------
    def __getitem__(self, key: str) -> Any:
        value = dict.__getitem__(self, key)
        return value

    def get(self, key: str, default: Any = None) -> Any:
        value = dict.get(self, key, default)
        if value == MISSING:
            return default
        return value

    # -- structural ops -------------------------------------------------------
    def merge(self, other: dict) -> "Config":
        """Deep merge ``other`` into self (other wins); returns self."""
        for key, value in other.items():
            if (
                key in self
                and isinstance(dict.__getitem__(self, key), Config)
                and isinstance(value, dict)
            ):
                dict.__getitem__(self, key).merge(value)
            else:
                self[key] = _wrap(copy.deepcopy(value))
        return self

    def select(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = dict.__getitem__(node, part)
        return node

    def update_dotted(self, dotted: str, value: Any, allow_new: bool = True) -> None:
        parts = dotted.split(".")
        node: Config = self
        for part in parts[:-1]:
            if part not in node or not isinstance(dict.__getitem__(node, part), Config):
                if not allow_new:
                    raise KeyError(f"No config node '{part}' in path '{dotted}'")
                node[part] = Config()
            node = dict.__getitem__(node, part)
        if not allow_new and parts[-1] not in node:
            raise KeyError(
                f"Key '{dotted}' not found; prefix with '+' to add a new key"
            )
        node[parts[-1]] = _wrap(value)

    def to_dict(self) -> dict:
        out: dict = {}
        for key, value in self.items():
            out[key] = value.to_dict() if isinstance(value, Config) else value
        return out

    def walk(self, prefix: str = "") -> Iterator[tuple[str, Any]]:
        for key, value in self.items():
            path = f"{prefix}.{key}" if prefix else str(key)
            if isinstance(value, Config):
                yield from value.walk(path)
            else:
                yield path, value

    def copy(self) -> "Config":  # type: ignore[override]
        return from_dict(self.to_dict())


def _wrap(value: Any) -> Any:
    if isinstance(value, Config):
        return value
    if isinstance(value, dict):
        return from_dict(value)
    if isinstance(value, list):
        return [_wrap(v) for v in value]
    return value


def from_dict(data: dict) -> Config:
    cfg = Config()
    for key, value in data.items():
        cfg[key] = _wrap(value)
    return cfg


class StaticConfig:
    """Immutable, non-dict view of a Config for use as a flax module attribute.

    flax.linen auto-converts dict attributes to FrozenDict, losing attribute
    access; this wrapper is opaque to flax and hashable so modules treat the
    config as static metadata.
    """

    def __init__(self, cfg: "Config | dict"):
        if isinstance(cfg, StaticConfig):
            cfg = cfg._cfg
        if not isinstance(cfg, Config):
            cfg = from_dict(dict(cfg))
        object.__setattr__(self, "_cfg", cfg)
        object.__setattr__(self, "_key", repr(sorted(cfg.walk())))

    def __getattr__(self, key: str) -> Any:
        value = getattr(object.__getattribute__(self, "_cfg"), key)
        return StaticConfig(value) if isinstance(value, Config) else value

    def __getitem__(self, key: str) -> Any:
        return self.__getattr__(key)

    def __contains__(self, key: str) -> bool:
        return key in object.__getattribute__(self, "_cfg")

    def get(self, key: str, default: Any = None) -> Any:
        value = object.__getattribute__(self, "_cfg").get(key, default)
        return StaticConfig(value) if isinstance(value, Config) else value

    def __setattr__(self, key: str, value: Any) -> None:
        raise AttributeError("StaticConfig is immutable; use .replace()")

    def replace(self, **kv) -> "StaticConfig":
        new = object.__getattribute__(self, "_cfg").copy()
        for key, value in kv.items():
            new.update_dotted(key, value)
        return StaticConfig(new)

    def to_config(self) -> Config:
        return object.__getattribute__(self, "_cfg").copy()

    def to_dict(self) -> dict:
        return object.__getattribute__(self, "_cfg").to_dict()

    def __eq__(self, other) -> bool:
        return isinstance(other, StaticConfig) and self._key == other._key

    def __hash__(self) -> int:
        return hash(object.__getattribute__(self, "_key"))

    def __repr__(self) -> str:
        return f"StaticConfig({object.__getattribute__(self, '_cfg')!r})"


_INTERP_RE = re.compile(r"\$\{([^}]+)\}")


def resolve_interpolations(root: Config) -> None:
    """Resolve ``${a.b}`` and ``${now:%fmt}`` in all string leaves, in place."""

    now = datetime.datetime.now()

    def resolve_str(s: str, depth: int = 0) -> Any:
        match = _INTERP_RE.fullmatch(s)

        def sub_one(expr: str) -> Any:
            if expr.startswith("now:"):
                return now.strftime(expr[len("now:"):])
            val = root.select(expr)
            if val is None:
                raise KeyError(f"Interpolation '${{{expr}}}' not found")
            if isinstance(val, str) and _INTERP_RE.search(val) and depth < 8:
                val = resolve_str(val, depth + 1)
            return val

        if match:  # whole-string interpolation keeps the value's type
            return sub_one(match.group(1))
        return _INTERP_RE.sub(lambda m: str(sub_one(m.group(1))), s)

    def visit(node: Config) -> None:
        for key, value in list(node.items()):
            if isinstance(value, Config):
                visit(value)
            elif isinstance(value, str) and _INTERP_RE.search(value):
                node[key] = resolve_str(value)

    visit(root)
