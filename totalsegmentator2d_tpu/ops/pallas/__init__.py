"""Pallas TPU kernels for the hot ops (with jnp fallbacks)."""

from .norm_act import instance_norm_act

__all__ = ['instance_norm_act']
