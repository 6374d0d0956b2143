"""Model zoo: plans-driven 2D U-Nets and checkpoint conversion."""

from .plans import ArchSpec, ModelSpec, PreprocessSpec, parse_model_spec
from .unet import forward, init_params, pad_to_stride, param_count

__all__ = ['ArchSpec', 'ModelSpec', 'PreprocessSpec', 'parse_model_spec',
           'forward', 'init_params', 'pad_to_stride', 'param_count']
