"""Dot-key parameter system.

Flat parameter dictionaries use dotted keys (``'nnu.predict.stepsize'``) that
address paths in nested dictionaries. This mirrors the reference framework's
config namespace (see reference ts2d/core/util/types.py:60-255) but is a
fresh, minimal implementation: a handful of pure functions over plain dicts.
"""

from __future__ import annotations

import typing
from typing import Any, Iterable, Mapping

_MISSING = object()


def split_key(key: str) -> list[str]:
    return [p for p in str(key).split('.') if p]


def dict_get(d: Mapping, key: str, default: Any = None, dtype: Any = None) -> Any:
    """Fetch a value addressed by a dotted key from a nested mapping.

    The flat form is also accepted: if ``d`` directly contains ``key`` as a
    literal entry, that wins.  ``dtype`` optionally converts the result (see
    :func:`convert`).
    """
    if isinstance(d, Mapping) and key in d:
        val = d[key]
    else:
        val = _walk(d, split_key(key))
    if val is _MISSING:
        return default
    return convert(val, dtype) if dtype is not None else val


def dict_has(d: Mapping, key: str) -> bool:
    if isinstance(d, Mapping) and key in d:
        return True
    return _walk(d, split_key(key)) is not _MISSING


def _walk(d: Any, parts: list[str]) -> Any:
    cur = d
    for i, p in enumerate(parts):
        if not isinstance(cur, Mapping):
            return _MISSING
        if p in cur:
            cur = cur[p]
            continue
        # allow a flat remainder, e.g. {'a': {'b.c': 1}} for key 'a.b.c'
        rest = '.'.join(parts[i:])
        if rest in cur:
            return cur[rest]
        return _MISSING
    return cur


def dict_set(d: dict, key: str, value: Any) -> dict:
    """Set a dotted key in a nested dict, creating intermediate dicts."""
    parts = split_key(key)
    cur = d
    for p in parts[:-1]:
        nxt = cur.get(p)
        if not isinstance(nxt, dict):
            nxt = {}
            cur[p] = nxt
        cur = nxt
    cur[parts[-1]] = value
    return d


def nest_dict(flat: Mapping) -> dict:
    """Expand a flat dict with dotted keys into a nested dict."""
    res: dict = {}
    for k, v in flat.items():
        if isinstance(v, Mapping):
            v = nest_dict(v)
        dict_set(res, k, v)
    return res


def flatten_dict(d: Mapping, prefix: str = '') -> dict:
    """Inverse of :func:`nest_dict`: collapse a nested dict to dotted keys."""
    res: dict = {}
    for k, v in d.items():
        key = f'{prefix}{k}'
        if isinstance(v, Mapping) and v:
            res.update(flatten_dict(v, prefix=f'{key}.'))
        else:
            res[key] = v
    return res


def dict_merge(base: Mapping | None, *overlays: Mapping | None) -> dict:
    """Deep merge: later dicts override earlier ones; nested dicts merge
    recursively, everything else replaces. Inputs are not mutated."""
    res: dict = dict(base or {})
    for overlay in overlays:
        if not overlay:
            continue
        for k, v in overlay.items():
            if isinstance(v, Mapping) and isinstance(res.get(k), Mapping):
                res[k] = dict_merge(res[k], v)
            else:
                res[k] = v
    return res


def convert(value: Any, dtype: Any) -> Any:
    """Convert ``value`` to ``dtype``, understanding typing generics like
    ``List[int]`` and passing None through untouched."""
    if value is None or dtype is None:
        return value
    origin = typing.get_origin(dtype)
    if origin in (list, tuple, set):
        args = typing.get_args(dtype)
        elem = args[0] if args else None
        items = value if isinstance(value, (list, tuple, set)) else [value]
        return origin(convert(v, elem) for v in items)
    if dtype is bool:
        if isinstance(value, str):
            return value.strip().lower() in ('1', 'true', 'yes', 'on')
        return bool(value)
    if isinstance(value, dtype) if isinstance(dtype, type) else False:
        return value
    return dtype(value)


# -- small collection helpers -------------------------------------------------

def as_list(v: Any) -> list:
    if v is None:
        return []
    if isinstance(v, (list, tuple, set, frozenset)):
        return list(v)
    if isinstance(v, Iterable) and not isinstance(v, (str, bytes, Mapping)):
        return list(v)
    return [v]


def as_set(v: Any) -> set:
    return set(as_list(v))


def as_tuple(v: Any) -> tuple:
    return tuple(as_list(v))


def unwrap_singular(v: Any) -> Any:
    """Return the single element of a 1-element collection, else the input."""
    vals = as_list(v)
    return vals[0] if len(vals) == 1 else v


def default(value: Any, fallback: Any) -> Any:
    return fallback if value is None else value


def native(v: Any) -> Any:
    """Convert numpy scalars/arrays to plain Python types (for JSON etc.)."""
    import numpy as np

    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, (list, tuple)):
        return type(v)(native(x) for x in v)
    if isinstance(v, dict):
        return {native(k): native(x) for k, x in v.items()}
    return v


def format_array(arr, p: int = 3, sep: str = ', ') -> str:
    """Compact human-readable formatting of a sequence (reference
    util.py format_array)."""
    def fmt(v):
        if isinstance(v, float):
            s = f'{v:.{p}f}'.rstrip('0').rstrip('.')
            return s if s else '0'
        return str(v)
    return sep.join(fmt(v) for v in as_list(arr))


def short_message(text: str, limit: int = 120, ellipsis: str = '...') -> str:
    """Truncate long strings for logs/metadata."""
    text = str(text)
    if len(text) <= limit:
        return text
    return text[:max(limit - len(ellipsis), 0)] + ellipsis


def unit_vector(v) -> 'Any':
    import numpy as np
    arr = np.asarray(v, dtype=float)
    n = np.linalg.norm(arr)
    return arr / n if n > 0 else arr


def parse_int(v: Any, err: Any = None) -> int | None:
    try:
        return int(v)
    except (TypeError, ValueError):
        return err


def parse_float(v: Any, err: Any = None) -> float | None:
    try:
        return float(v)
    except (TypeError, ValueError):
        return err
