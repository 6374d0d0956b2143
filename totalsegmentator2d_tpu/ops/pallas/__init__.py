"""Pallas TPU kernels for the hot ops (with jnp fallbacks).

One kernel earned its place (measured on v5e, tools/perf_probe4.py): the
cubic B-spline prefilter IIR — ~20 ms faster per resampling program than
the associative-scan lowering, ON by default (TS2D_PALLAS=0 disables). A
fused InstanceNorm+LeakyReLU kernel was benchmarked and DELETED: XLA's
reduce+elementwise fusion beat it at every shape that fit VMEM, and fp32
temporaries of stage-0-sized planes overflow VMEM.
"""

from .prefilter import bspline_prefilter_pallas

__all__ = ['bspline_prefilter_pallas']
