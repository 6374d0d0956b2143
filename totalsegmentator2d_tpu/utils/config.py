"""Packaged configuration & registry loaders.

Three data artifacts ship with the package (reference: ts2d/data/*):
 - ``config.json``   — default model key + alias resolve map + test keys
 - ``shared.json``   — remote model registry {model: {revision: {group: url}}}
 - ``label-colors.csv`` — label name -> hex color rows

``get_shared_urls`` optionally refreshes the registry from the upstream
GitHub raw URL (reference config.py:23-46) with a local fallback.
"""

from __future__ import annotations

import csv
import functools
import os

from .files import get_package_data_dir, read_json
from .logging import warn

_SHARED_URL = ('https://raw.githubusercontent.com/risc-mi/totalsegmentator2D/'
               'main/ts2d/data/shared.json')


def _data_path(name: str) -> str:
    return os.path.join(get_package_data_dir(), name)


@functools.lru_cache(maxsize=None)
def get_label_colors() -> dict:
    """Label name -> hex color, keys lowercased."""
    colors = {}
    with open(_data_path('label-colors.csv'), newline='') as f:
        for row in csv.DictReader(f):
            label = (row.get('Label') or '').strip().lower()
            color = (row.get('Color') or '').strip()
            if label and color:
                colors[label] = color
    return colors


@functools.lru_cache(maxsize=None)
def _get_config() -> dict:
    return read_json(_data_path('config.json'))


def get_default_model() -> str:
    return _get_config()['default-model']


def get_model_resolve_map() -> dict:
    return dict(_get_config().get('default-resolve', {}))


def get_test_model(kind: str = 'single') -> str:
    return _get_config()[f'default-test-model-{kind}']


def get_shared_urls(fetch_remote: bool = False, timeout: float = 10.0) -> dict:
    """The remote model registry. With ``fetch_remote`` the latest registry is
    fetched from the upstream repository's main branch; any failure falls back
    to the packaged copy."""
    if fetch_remote:
        try:
            import requests
            resp = requests.get(_SHARED_URL, timeout=timeout)
            resp.raise_for_status()
            return resp.json()
        except Exception as ex:
            warn(f'Failed to fetch the remote registry ({ex}); using the local copy.', once=True)
    return read_json(_data_path('shared.json'))
