"""Config composition: defaults lists, groups, CLI overrides.

Work-alike of the Hydra composition pipeline the reference uses
(reference: configs/train_ocr.yaml defaults list, README.md:14-15 CLI).
"""

from __future__ import annotations

import functools
import os
import sys
from pathlib import Path
from typing import Any, Callable, Sequence

import yaml

from .node import MISSING, Config, MissingMandatoryValue, from_dict, resolve_interpolations

DEFAULT_CONFIG_DIR = Path(__file__).resolve().parents[2] / "configs"


class _OmegaLoader(yaml.SafeLoader):
    """SafeLoader that, like OmegaConf, accepts `3e-4`-style floats."""


_OmegaLoader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    __import__("re").compile(
        r"""^(?:[-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |\.[0-9_]+(?:[eE][-+][0-9]+)?
        |[-+]?\.(?:inf|Inf|INF)
        |\.(?:nan|NaN|NAN))$""",
        __import__("re").X,
    ),
    list("-+0123456789."),
)


def _yaml_load(text: str):
    return yaml.load(text, Loader=_OmegaLoader)


def _load_yaml(path: Path) -> dict:
    with open(path) as f:
        data = _yaml_load(f.read())
    return data or {}


def _compose_file(config_dir: Path, rel: str, group_selections: dict[str, str]) -> Config:
    """Compose one yaml file, honouring its ``defaults`` list.

    ``rel`` is relative to ``config_dir`` without extension, e.g. ``ocr/slate``.
    Bare defaults entries (``_base``) resolve within the same directory; mapping
    entries (``ocr: slate``) select from the sub-group directory.
    """
    path = config_dir / f"{rel}.yaml"
    if not path.exists():
        raise FileNotFoundError(f"Config file not found: {path}")
    raw = _load_yaml(path)
    defaults = raw.pop("defaults", None)
    own = from_dict(raw)
    if defaults is None:
        return own

    base_dir = str(Path(rel).parent)
    composed = Config()
    self_merged = False
    for entry in defaults:
        if entry == "_self_":
            composed.merge(own)
            self_merged = True
        elif isinstance(entry, str):
            sub_rel = entry if base_dir in ("", ".") else f"{base_dir}/{entry}"
            composed.merge(_compose_file(config_dir, sub_rel, group_selections))
        elif isinstance(entry, dict):
            (group, name), = entry.items()
            name = group_selections.get(group, name)
            if name == MISSING or name is None:
                if group in group_selections:
                    name = group_selections[group]
                else:
                    # leave a marker so access errors are informative
                    composed[group] = MISSING
                    continue
            sub = _compose_file(config_dir, f"{group}/{name}", group_selections)
            node = composed.setdefault(group, Config())
            if node == MISSING or not isinstance(node, Config):
                composed[group] = sub
            else:
                node.merge(sub)
        else:
            raise ValueError(f"Unsupported defaults entry: {entry!r}")
    if not self_merged:
        composed.merge(own)
    return composed


def parse_overrides(argv: Sequence[str]) -> tuple[dict[str, str], list[tuple[str, Any, bool]]]:
    """Split CLI args into group selections and dotted value overrides."""
    groups: dict[str, str] = {}
    values: list[tuple[str, Any, bool]] = []
    for arg in argv:
        if "=" not in arg:
            raise ValueError(f"Override '{arg}' must look like key=value")
        key, _, raw_val = arg.partition("=")
        additive = key.startswith("+")
        if additive:
            key = key[1:]
        value = _yaml_load(raw_val) if raw_val != "" else ""
        if "." not in key and isinstance(value, str) and not additive:
            # Possibly a group selection like `ocr=slate`
            groups[key] = value
        values.append((key, value, additive))
    return groups, values


def compose(
    config_name: str,
    overrides: Sequence[str] = (),
    config_dir: str | os.PathLike | None = None,
) -> Config:
    config_dir = Path(config_dir) if config_dir else DEFAULT_CONFIG_DIR
    group_selections, value_overrides = parse_overrides(overrides)

    # Only keep group selections that actually name a group directory + file.
    real_groups = {}
    for group, name in list(group_selections.items()):
        if (config_dir / group / f"{name}.yaml").exists():
            real_groups[group] = name
        elif (config_dir / group).is_dir():
            options = sorted(p.stem for p in (config_dir / group).glob("*.yaml")
                             if not p.stem.startswith("_"))
            raise FileNotFoundError(
                f"Unknown option '{name}' for config group '{group}'. "
                f"Available: {', '.join(options)}"
            )

    cfg = _compose_file(config_dir, config_name, real_groups)

    for key, value, additive in value_overrides:
        if key in real_groups and not additive and "." not in key:
            continue  # consumed as a group selection
        cfg.update_dotted(key, value, allow_new=True)

    _check_missing(cfg)
    resolve_interpolations(cfg)
    return cfg


def _check_missing(cfg: Config, prefix: str = "") -> None:
    for key, value in cfg.items():
        path = f"{prefix}.{key}" if prefix else str(key)
        if isinstance(value, Config):
            _check_missing(value, path)
        elif value == MISSING:
            raise MissingMandatoryValue(
                f"Mandatory config group '{path}' was not provided "
                f"(pass `{path}=<name>` on the command line)"
            )


def main(config_name: str, config_dir: str | os.PathLike | None = None) -> Callable:
    """Decorator mirroring ``@hydra.main`` (reference: train_ocr.py:18)."""

    def decorator(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapper() -> Any:
            cfg = compose(config_name, sys.argv[1:], config_dir)
            # Persistent XLA compilation cache for every entry point — the
            # SLATE train step costs minutes to compile over a remote-compile
            # transport and must be paid once per machine, not per run.
            from ocrl_tpu.parallel import enable_compilation_cache

            enable_compilation_cache(str(DEFAULT_CONFIG_DIR.parent / ".jax_cache"))
            return fn(cfg)

        return wrapper

    return decorator
