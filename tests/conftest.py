"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware; set TS2D_TEST_TPU=1 to run on the real
platform instead.
"""

import os

if not os.environ.get('TS2D_TEST_TPU'):
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()
    # a sitecustomize hook may re-register a TPU platform and override the
    # env var; pin the config explicitly so tests really run on CPU
    import jax
    jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ASSETS = '/root/reference/assets'


def asset_path(name: str) -> str:
    return os.path.join(REFERENCE_ASSETS, name)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
