"""HostedModel: one anatomical-group model, resident on the accelerator.

TPU-native replacement for the reference's NNUModel/NNUProcessModel +
NNUWrapper stack (nnu.py:16-241, wrapper.py:35-220). Where the reference
spawns a worker *process* per model holding a torch predictor and ships
images through temp files, a HostedModel keeps its fold-stacked weights
resident in device HBM and runs the fused XLA program in-process; `start()`
compiles asynchronously on a host thread (the analogue of the reference's
non-blocking startup + dummy-task warmup, tool.py:45-58).

Configuration uses the same dot-key namespace as the reference
(wrapper.py:38-68): nnu.configuration, nnu.folds, nnu.plans, nnu.trainer,
nnu.predict.{augment,stepsize,checkpoint}, nnu.result.colors.
"""

from __future__ import annotations

import os
import re
import threading
from typing import Dict, List, Optional

import numpy as np

from ..io.image import MedicalImage
from ..models.convert import convert_checkpoint
from ..models.plans import ModelSpec, parse_model_spec
from ..ops.annotations import set_annotation_meta
from ..utils.files import read_json
from ..utils.logging import warn
from ..utils.params import default, dict_get
from .engine import InferenceEngine


def find_datasets(root: str, version: Optional[int] = None) -> Dict[int, str]:
    """Discover nnU-Net dataset dirs (Task###_* v1 / Dataset###_* v2) under a
    results root (reference wrapper.py:15-32)."""
    prefixes = {1: ('Task',), 2: ('Dataset',)}.get(version, ('Task', 'Dataset'))
    found = {}
    for dn in sorted(os.listdir(root)):
        for prefix in prefixes:
            if dn.startswith(prefix):
                tail = dn[len(prefix):].split('_')[0]
                if tail.isdigit():
                    found[int(tail)] = dn
    return found


class HostedModel:
    def __init__(self, config: dict):
        self.config = config
        param = config.get('param', {})
        self.id: str = config.get('id', '')
        self.model_name: str = config.get('model', self.id)
        self.group: Optional[str] = config.get('group')
        self.revision = config.get('revision')

        self.version = dict_get(param, 'nnu.version', default=2, dtype=int)
        self.task_id = dict_get(param, 'nnu.task', default=None, dtype=int)
        self.folds = dict_get(param, 'nnu.folds', default=None, dtype=List[int])
        self.plans_name = dict_get(param, 'nnu.plans', default='nnUNetPlans', dtype=str)
        self.configuration = dict_get(param, 'nnu.configuration',
                                      default='2d', dtype=str)
        self.trainer = dict_get(param, 'nnu.trainer', default='nnUNetTrainer',
                                dtype=str)
        self.checkpoint_name = dict_get(param, 'nnu.predict.checkpoint',
                                        default='final', dtype=str)
        self.use_mirroring = dict_get(param, 'nnu.predict.augment',
                                      default=True, dtype=bool)
        self.tile_step_size = dict_get(param, 'nnu.predict.stepsize',
                                       default=None, dtype=float)
        # 'exact' = fp32 everywhere; 'fast' = bf16 conv operands with fp32
        # accumulation/norms (the precision class of the reference's torch
        # fp16 autocast inference)
        self.precision = dict_get(param, 'nnu.predict.precision',
                                  default='exact', dtype=str)
        self.result_colors = dict_get(param, 'nnu.result.colors', default='ts2d')

        self._configure(config['root'])
        self._engine: Optional[InferenceEngine] = None
        self._start_lock = threading.Lock()
        self._fold_params: Optional[List[dict]] = None
        self._startup_thread: Optional[threading.Thread] = None
        self._startup_error: Optional[BaseException] = None

    # -- results-tree discovery -------------------------------------------

    def _configure(self, root: str) -> None:
        tasks = find_datasets(root, version=self.version)
        if not tasks:
            raise RuntimeError(f'No nnU-Net dataset dir found under {root}')
        if self.task_id is None:
            if len(tasks) > 1:
                raise RuntimeError(
                    f'Ambiguous task id; found {sorted(tasks)} — set nnu.task')
            self.task_id = next(iter(tasks))
        if self.task_id not in tasks:
            raise RuntimeError(f'Task {self.task_id} not found under {root}')
        self.task_name = tasks[self.task_id]

        trainer_dir = '__'.join([self.trainer, self.plans_name, self.configuration])
        data_dir = os.path.join(root, self.task_name, trainer_dir)
        if not os.path.isdir(data_dir):
            raise RuntimeError(f'Missing results dir: {data_dir}')
        self.data_dir = data_dir

        self.dataset_json = read_json(os.path.join(data_dir, 'dataset.json'))
        self.plans = read_json(os.path.join(data_dir, 'plans.json'))

        fold_dirs = sorted(
            (int(m.group(1)), os.path.join(data_dir, d))
            for d in os.listdir(data_dir)
            if (m := re.match(r'fold_(\d+)$', d)))
        if self.folds is not None:
            fold_dirs = [(f, p) for f, p in fold_dirs if f in self.folds]
        if not fold_dirs:
            raise RuntimeError(f'No fold directories found under {data_dir}')
        self.fold_dirs = fold_dirs
        self.folds = [f for f, _ in fold_dirs]

        # spec without checkpoint meta first; refined after weights load
        self.spec: ModelSpec = parse_model_spec(
            self.plans, self.dataset_json, configuration=self.configuration)

    # -- identity / metadata ----------------------------------------------

    @property
    def uid(self) -> str:
        return self.id

    @property
    def name(self) -> str:
        return self.model_name

    @staticmethod
    def verify_setup() -> None:
        """Check the runtime can actually execute models (the analogue of
        the reference's torch/nnunetv2 import checks, wrapper.py:85-111)."""
        try:
            import jax
        except ImportError as ex:
            raise RuntimeError(
                'JAX is not available in the current python environment!'
            ) from ex
        devices = jax.devices()
        if not devices:
            raise RuntimeError('No JAX devices are available')
        if devices[0].platform == 'cpu':
            warn('No accelerator detected - inference will run on CPU.',
                 once=True)

    def get_exts(self) -> list:
        """Supported image file extensions (reference wrapper.py:276-277)."""
        return ['png', 'bmp', 'nii.gz', 'nrrd', 'mha', 'tif', 'tiff']

    @property
    def multilabel(self) -> bool:
        return self.spec.multilabel

    @property
    def channels(self) -> Dict[int, str]:
        """Channel index -> projection name ('max', 'mean', ...), from
        dataset.json channel_names (reference wrapper.py:273-274)."""
        return dict(self.spec.channel_names)

    @property
    def labels(self) -> Dict[int, str]:
        return dict(self.spec.labels)

    def get_colors(self) -> Dict[str, object]:
        colors = self.result_colors
        if isinstance(colors, str) or colors is None:
            from ..utils.colors import named_palette
            names = [n for _, n in sorted(self.labels.items())]
            return dict(zip(names, named_palette(colors, len(names))))
        return dict(colors)

    # -- lifecycle ----------------------------------------------------------

    def load_fold_params(self) -> List[dict]:
        """Convert all fold checkpoints to host-side params pytrees (cached).
        Also refines the spec with the checkpoint's mirroring axes."""
        if self._fold_params is not None:
            return self._fold_params
        ckpt_file = f'checkpoint_{self.checkpoint_name}.pth'
        fold_params, axes_seen = [], []
        for f, d in self.fold_dirs:
            path = os.path.join(d, ckpt_file)
            if not os.path.exists(path):
                raise RuntimeError(f'Missing checkpoint: {path}')
            params, meta = convert_checkpoint(path, self.spec.arch)
            fold_params.append(params)
            ax = meta.get('inference_allowed_mirroring_axes')
            if ax is not None:
                axes_seen.append((f, tuple(ax)))
        if axes_seen:
            # the TTA axes come from the checkpoints, not just the last
            # fold read: any fold carrying them refines the spec, and
            # disagreeing folds get flagged (mixed-provenance checkpoints)
            if len({ax for _, ax in axes_seen}) > 1:
                warn(f'Model {self.id}: folds disagree on '
                     f'inference_allowed_mirroring_axes ({axes_seen}); '
                     f'using fold {axes_seen[0][0]}\'s {axes_seen[0][1]}')
            self.spec = parse_model_spec(
                self.plans, self.dataset_json,
                configuration=self.configuration,
                checkpoint_meta={'inference_allowed_mirroring_axes':
                                 list(axes_seen[0][1])})
        self._fold_params = fold_params
        return fold_params

    def compute_dtype(self):
        if str(self.precision).lower() in ('fast', 'bf16', 'bfloat16'):
            import jax.numpy as jnp
            return jnp.bfloat16
        return None

    def _load_engine(self) -> InferenceEngine:
        return InferenceEngine(
            self.spec, self.load_fold_params(),
            tile_step_size=default(self.tile_step_size, 0.5),
            use_mirroring=self.use_mirroring,
            compute_dtype=self.compute_dtype())

    def start(self, wait: bool = True) -> None:
        """Load weights and compile the default-shape program; non-blocking
        when wait=False (pair with await_startup). A start while an async
        startup is already pending joins it (wait=True) or is a no-op
        (wait=False) — never a second concurrent weight load + compile."""
        def _boot():
            try:
                engine = self._load_engine()
                engine.warmup(self.spec.preprocess.patch_size)
                self._engine = engine
            except BaseException as ex:  # surfaced by await_startup
                self._startup_error = ex

        with self._start_lock:
            if self._engine is None and self._startup_thread is None:
                self._startup_thread = threading.Thread(target=_boot,
                                                        daemon=True)
                self._startup_thread.start()
        if wait:
            self.await_startup()

    def await_startup(self) -> None:
        with self._start_lock:
            t = self._startup_thread
        if t is not None:
            t.join()
            with self._start_lock:
                if self._startup_thread is t:
                    self._startup_thread = None
        if self._startup_error is not None:
            err, self._startup_error = self._startup_error, None
            raise RuntimeError(f'Model {self.id} failed to start') from err

    def stop(self) -> None:
        # a pending async startup would assign a fresh engine AFTER this
        # call, resurrecting a stopped model — wait it out first
        with self._start_lock:
            t = self._startup_thread
        if t is not None:
            t.join()
            with self._start_lock:
                if self._startup_thread is t:
                    self._startup_thread = None
            self._startup_error = None
        self._engine = None

    @property
    def started(self) -> bool:
        return self._engine is not None

    # -- prediction ----------------------------------------------------------

    def apply(self, img: MedicalImage) -> MedicalImage:
        """Segment a 2D (possibly multi-channel) image. Returns a multilabel
        one-hot vector image (or labelmap for non-multilabel models) with
        3D-Slicer Segment metadata, in the input geometry."""
        if self._engine is None:
            self.start(wait=True)
        if img.dim != 2:
            raise ValueError(f'apply() expects a 2D image, got dim={img.dim}')

        arr = img.array
        if not img.is_vector:
            arr = arr[..., None]
        if arr.shape[-1] != self.spec.arch.in_channels:
            raise ValueError(
                f'The number of channels in the input image does not match '
                f'the model channel definition '
                f'({self.spec.arch.in_channels} vs {arr.shape[-1]}).')

        spacing_yx = tuple(reversed(img.spacing))  # array-order spacing
        seg = self._engine.predict_array(arr.astype(np.float32), spacing_yx)

        names = {v: n for v, n in self.labels.items()}
        colors = {}
        palette = self.get_colors()
        for v, n in names.items():
            c = palette.get(n) or palette.get(str(n).lower())
            if c is not None:
                colors[n] = c

        if self.multilabel:
            out = img.replace(array=seg, is_vector=True, meta={})
        else:
            out = img.replace(array=seg, is_vector=False, meta={})
        set_annotation_meta(out, names=names, colors=colors)
        return out

    def __repr__(self) -> str:
        return (f'HostedModel({self.id!r}, folds={self.folds}, '
                f'labels={len(self.labels)}, multilabel={self.multilabel})')
