"""Environment gate (the reference's test_000_env checks its nnunetv2 fork;
here: JAX present, devices live, codecs and package data intact)."""

import numpy as np


def test_jax_runtime():
    import jax
    import jax.numpy as jnp
    devices = jax.devices()
    assert devices, 'no JAX devices'
    assert float(jnp.ones(4).sum()) == 4.0


def test_package_importable_and_versioned():
    import totalsegmentator2d_tpu as pkg
    assert pkg.__version__
    from totalsegmentator2d_tpu import TS2D  # lazy export resolves
    assert TS2D is not None


def test_model_setup_verifies():
    from totalsegmentator2d_tpu.inference import HostedModel
    HostedModel.verify_setup()  # raises if the runtime cannot execute models


def test_packaged_data_complete():
    from totalsegmentator2d_tpu.utils import config
    assert config.get_default_model()
    assert len(config.get_label_colors()) > 100
    assert config.get_shared_urls(fetch_remote=False)


def test_codec_available_or_fallback():
    from totalsegmentator2d_tpu.io import native
    data = b'x' * 10000
    assert native.gzip_decompress(native.gzip_compress(data)) == data
