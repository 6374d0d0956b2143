"""Command-line interface.

Flag set and output naming match the reference CLI (ts2d/main.py:85-115):
ts2d -i/--src <file|dir> -o/--dest <dir> [--model KEY] [--no-remote]
[--no-fetch] [--collapse] [--visualize] [--save-all] [--silent]
"""

from __future__ import annotations

import os
import shutil
from glob import glob
from typing import Iterator, Optional, Tuple

from .utils.config import get_default_model
from .utils.logging import log, log_silent

_SUPPORTED = ('nrrd', 'nii', 'nii.gz', 'mha', 'mhd',
              # single DICOM files also read natively (io/dicom.py); a
              # DICOM *series* is a directory case, see _enumerate_cases;
              # a .zip holds one zipped series
              'dcm', 'dicom', 'ima', 'zip')

_CITATION = (
    'TS2D is a research tool. It is NOT validated for clinical use and should '
    'NOT be used for medical diagnosis or treatment.\n'
    'Please cite the following paper when using TS2D:\n'
    'Sabrowsky-Hirsch, B., Alshenoudy, A., Thumfart, S., & Giretzlehner, M. '
    '(2025, July).\n'
    'TotalSegmentator 2D: A Tool for Rapid Anatomical Structure Analysis.\n'
    'In Annual Conference on Medical Image Understanding and Analysis '
    '(pp. 32-43). Cham: Springer Nature Switzerland.\n\n'
    "If you're using TSXR, please also cite the following paper:\n"
    'Alshenoudy, A., Sabrowsky-Hirsch, B., Thumfart, S., & Giretzlehner, M. '
    '(2025, July).\n'
    'Leveraging Synthetic Data for Whole-Body Segmentation in X-Ray Images.\n'
    'In Annual Conference on Medical Image Understanding and Analysis '
    '(pp. 145-158). Cham: Springer Nature Switzerland.'
)


def _enumerate_cases(src: str) -> Iterator[Tuple[str, str]]:
    """Yield (name, path) for the input file or every supported file in the
    input directory (extension filter as in the reference, main.py:10-32).
    A directory of DICOM slice files is ONE case (the series); so is any
    DICOM-series subdirectory of the input directory (beyond the
    reference, which requires prior conversion to NRRD/NIfTI)."""
    from .io.dicom import is_dicom_dir
    from .utils.logging import warn

    seen: dict = {}

    def _uniq(name: str, path: str) -> str:
        # same-stem inputs (a.nrrd + a.nii, or a DICOM subdir 'case1'
        # next to case1.nii.gz) must not silently overwrite each other's
        # outputs in dest — disambiguate the later one
        if name not in seen:
            seen[name] = 1
            return name
        new = name
        while new in seen:
            seen[name] += 1
            new = f'{name}-{seen[name]}'
        seen[new] = 1
        warn(f"duplicate case name '{name}' ({path}): outputs would "
             f"overwrite an earlier case's — writing this one as '{new}'")
        return new

    isdir = os.path.isdir(src)
    if is_dicom_dir(src):
        yield os.path.basename(os.path.normpath(src)), src
        return
    paths = glob(os.path.join(src, '*.*')) if isdir else [src]
    if isdir:
        for sub in sorted(glob(os.path.join(src, '*'))):
            if is_dicom_dir(sub):
                yield _uniq(os.path.basename(os.path.normpath(sub)), sub), sub
    for fp in sorted(paths):
        try:
            if not os.path.exists(fp):
                raise FileNotFoundError(f'Source file does not exist: {fp}')
            if not os.path.isfile(fp):
                raise ValueError(f'Source is not a regular file: {fp}')
            fn = os.path.basename(fp)
            if '.' not in fn:
                raise ValueError(f'Source file does not have an extension: {fn}')
            name, ext = fn.split('.', 1)
            if ext.lower() not in _SUPPORTED:
                raise ValueError(f'Unsupported file extension: {ext} in {fn}')
            if isdir and ext.lower() in ('dcm', 'dicom', 'ima'):
                # a loose slice file in a MIXED directory is almost always
                # one slice of a series: segmenting it standalone (dz=1)
                # would silently produce near-meaningless output. Point the
                # tool at the series directory instead; explicit single-file
                # input (-i file.dcm) still works.
                warn(f'skipping loose DICOM file {fn} in a mixed directory '
                     f'(likely one slice of a series) — pass the series '
                     f'directory, or the file itself, as --src to segment it',
                     once=True)
                continue
            yield _uniq(name, fp), fp
        except Exception:
            if isdir:
                continue  # skip unsupported files when scanning a directory
            raise


def ts2d_run(src: str, dest: str, model: Optional[str] = None,
             use_remote: bool = True, fetch_remote: bool = True,
             collapse: bool = False, visualize: bool = True,
             save_all: bool = False, silent: bool = False,
             local: Optional[str] = None,
             trace: Optional[str] = None,
             batching: bool = True) -> None:
    """Run TS2D on one image or a directory of images. ``trace`` writes a
    jax.profiler device trace (TensorBoard/Perfetto) to the given directory.
    ``batching=False`` disables micro-batched dispatch for bitwise
    run-to-run consistency (see TS2D)."""
    from .api import TS2D
    from .utils.trace import device_trace

    model = get_default_model() if model is None else model
    content = 'all' if visualize else 'file'
    models = 'all' if save_all else 'final'

    # scope the silent switch to this run: ts2d_run is also a library entry
    # (tests, notebooks), where leaking the global mute would silence every
    # later log() in the process
    from .utils.logging import is_silent
    was_silent = is_silent()
    log_silent(silent)
    try:
        tsize = shutil.get_terminal_size(fallback=(120, 20))
        bar = '#' * tsize.columns
        log(f'\n{bar}\n{_CITATION}\n{bar}\n')

        with TS2D(key=model, use_remote=use_remote,
                  fetch_remote=fetch_remote, local=local,
                  batching=batching) as tool, device_trace(trace):
            cases = list(_enumerate_cases(src))
            n = len(cases)
            log(f'Predicting {n} case{"s" if n != 1 else ""}')
            save_kwargs = dict(dest=dest, models=models, content=content,
                               targets=['segmentation', 'projection'])
            if n > 1:
                # pipelined mode: IO prefetch + async export overlap
                # device work
                from .inference.pipeline import ScanPipeline
                ScanPipeline(tool).run(cases, collapse=collapse,
                                       save_kwargs=save_kwargs)
            else:
                for i, (name, path) in enumerate(cases):
                    log(f'[{i + 1}/{n}] Processing: {name}')
                    res = tool.predict(path, collapse=collapse)
                    res.save(name=name, **save_kwargs)
    finally:
        log_silent(was_silent)


def ts2d_entry_point() -> None:
    import argparse

    parser = argparse.ArgumentParser(
        description='Runs TotalSegmentator2D (TS2D, TPU-native build) on '
                    'images or directories of images to automatically segment '
                    'anatomical structures.')
    parser.add_argument('--src', '-i', '--input', type=str, required=True,
                        help='Input image file or directory. Supported '
                             'formats: nrrd, nii, nii.gz, mha, mhd')
    parser.add_argument('--dest', '-o', '--output', type=str, required=True,
                        help='Output directory for results.')
    parser.add_argument('--model', type=str, default=None,
                        help="Model key for prediction, defaults to "
                             "'ts2d-v2-ep4000b2'.")
    parser.add_argument('--no-remote', action='store_true',
                        help='Disable remote model download. Models must be '
                             'available locally.')
    parser.add_argument('--no-fetch', action='store_true',
                        help='Do not fetch the latest model URLs from the '
                             'remote repository; use the local shared.json.')
    parser.add_argument('--collapse', action='store_true',
                        help='Collapse projected images to 2D. This removes '
                             'the 3D geometrical information.')
    parser.add_argument('--visualize', action='store_true',
                        help='Visualize the results as PNG images.')
    parser.add_argument('--save-all', action='store_true',
                        help='In addition to the final result, also saves '
                             'results for each individual model.')
    parser.add_argument('--silent', action='store_true',
                        help='Hides any unnecessary output.')
    parser.add_argument('--local', type=str, default=None,
                        help='Override the local model database root '
                             '(defaults to ~/.ts2d/models).')
    parser.add_argument('--trace', type=str, default=None,
                        help='Write a jax.profiler device trace to this '
                             'directory (view in TensorBoard/Perfetto).')
    parser.add_argument('--no-batching', action='store_true',
                        help='Disable micro-batched dispatch (bitwise '
                             'run-to-run consistency; lower directory-mode '
                             'throughput).')
    from . import __version__
    parser.add_argument('--version', action='version',
                        version=f'ts2d (TPU-native) {__version__}')

    args = parser.parse_args()
    ts2d_run(src=args.src, dest=args.dest, model=args.model,
             use_remote=not args.no_remote, fetch_remote=not args.no_fetch,
             collapse=args.collapse, visualize=args.visualize,
             save_all=args.save_all, silent=args.silent, local=args.local,
             trace=args.trace, batching=not args.no_batching)
