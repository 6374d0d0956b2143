"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware; set TS2D_TEST_TPU=1 to run on the real
platform instead.
"""

import os

# never share the persistent compilation cache with TPU/bench runs: AOT
# CPU entries written through the tunnel target a different host's CPU
# features and load with SIGILL-risk warnings
os.environ.setdefault('TS2D_COMPILE_CACHE', '0')

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

# Synthetic regenerations of the reference's four bundled sample inputs
# (same headers/geometry corner cases, phantom content — tests/synth_assets
# .py), so the suite has no dependency on the read-only reference mount.
from tests.synth_assets import asset_path  # noqa: E402, F401


@pytest.fixture
def rng():
    return np.random.default_rng(0)
