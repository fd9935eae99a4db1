"""Typed config construction: dict -> dataclasses (a mini dacite).

Replaces the reference's Hydra + dacite pipeline (src/config.py:89-105):
YAML preset files are merged (defaults <- experiment <- CLI dotted
overrides) and validated into nested dataclasses. Union fields are
dispatched on the `name:` literal, like the reference's union configs
(e.g. src/model/autoencoder/__init__.py:11).
"""

from __future__ import annotations

import dataclasses
import types
import typing
from fractions import Fraction
from pathlib import Path
from typing import Any, Union

import yaml


def _is_dataclass_type(tp) -> bool:
    return dataclasses.is_dataclass(tp) and isinstance(tp, type)


def _dispatch_union(args, value):
    """Pick the union member whose `name` default matches value['name']."""
    non_none = [a for a in args if a is not type(None)]
    if not isinstance(value, dict) or "name" not in value:
        if len(non_none) == 1:
            return non_none[0]
        raise ValueError(f"cannot dispatch union {args} for value {value!r}")
    name = value["name"]
    for a in non_none:
        if _is_dataclass_type(a):
            for f in dataclasses.fields(a):
                if f.name == "name":
                    default = f.default
                    if default == name:
                        return a
                    # Literal annotation fallback
                    lit_args = typing.get_args(f.type)
                    if name in lit_args:
                        return a
    raise ValueError(f"no union member of {args} matches name={name!r}")


def from_dict(tp, value: Any):
    """Build an instance of type `tp` from plain data."""
    if value is None:
        return None

    origin = typing.get_origin(tp)
    if origin in (typing.Union, types.UnionType):
        args = typing.get_args(tp)
        if type(None) in args and value is None:
            return None
        non_none = [a for a in args if a is not type(None)]
        if len(non_none) == 1:
            return from_dict(non_none[0], value)
        dc_members = [a for a in non_none if _is_dataclass_type(a)]
        if dc_members and isinstance(value, dict):
            return from_dict(_dispatch_union(dc_members, value), value)
        return value

    if origin in (list, typing.List):
        (item_tp,) = typing.get_args(tp) or (Any,)
        return [from_dict(item_tp, v) for v in value]

    if origin in (tuple, typing.Tuple):
        args = typing.get_args(tp)
        if len(args) == 2 and args[1] is Ellipsis:
            return tuple(from_dict(args[0], v) for v in value)
        return tuple(from_dict(a, v) for a, v in zip(args, value))

    if origin in (dict, typing.Dict):
        k_tp, v_tp = typing.get_args(tp) or (Any, Any)
        return {k: from_dict(v_tp, v) for k, v in value.items()}

    if origin is typing.Literal:
        return value

    if tp is Fraction:
        return Fraction(value)

    if _is_dataclass_type(tp):
        if not isinstance(value, dict):
            raise TypeError(f"expected mapping for {tp.__name__}, got {value!r}")
        hints = typing.get_type_hints(tp)
        kwargs = {}
        known = {f.name for f in dataclasses.fields(tp)}
        unknown = set(value) - known
        if unknown:
            raise ValueError(f"unknown keys {sorted(unknown)} for {tp.__name__}")
        for f in dataclasses.fields(tp):
            if f.name in value:
                kwargs[f.name] = from_dict(hints.get(f.name, Any), value[f.name])
        return tp(**kwargs)

    return value


def deep_merge(base: dict, override: dict) -> dict:
    """Recursive dict merge; override wins; None overrides (clears) values."""
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def set_dotted(cfg: dict, dotted_key: str, value: Any) -> None:
    """Apply `a.b.c=value` style overrides in place."""
    keys = dotted_key.split(".")
    node = cfg
    for k in keys[:-1]:
        if not isinstance(node.get(k), dict):
            node[k] = {}
        node = node[k]
    node[keys[-1]] = value


def parse_cli_value(text: str) -> Any:
    return yaml.safe_load(text)


def load_yaml(path: Path) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}
