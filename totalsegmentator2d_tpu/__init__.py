"""TotalSegmentator 2D — TPU-native rebuild.

A JAX/XLA/Pallas framework for rapid anatomical structure segmentation of CT
scans (via coronal MIP/AIP projections) and native 2D X-rays, using ensembles
of 2D multilabel U-Nets. Public API mirrors the reference tool:

    from totalsegmentator2d_tpu import TS2D
    with TS2D(key='ts2d') as model:
        res = model.predict('scan.nrrd')
        res.save('out/', name='scan')
"""

__version__ = '0.4.0'


def __getattr__(name):
    # lazy imports keep `import totalsegmentator2d_tpu` light (no jax import)
    if name in ('TS2D',):
        from .api import TS2D
        return TS2D
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
