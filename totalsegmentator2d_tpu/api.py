"""Public API: the TS2D orchestrator and its Result container.

API-compatible with the reference tool (ts2d/tool.py:19-311): the same
constructor signature, predict()/Result.save() surface, output-file naming
matrix, and projection caching — but each anatomical-group model is a
device-resident HostedModel (fold-stacked weights in HBM, fused XLA predict
program) instead of a spawned torch worker process.
"""

from __future__ import annotations

import os
import traceback
from typing import Dict, List, Optional, Union

import numpy as np

from .inference.database import URLDataBase, decompose_model_key
from .inference.model import HostedModel
from .inference.zoo import Zoo
from .io import MedicalImage, read_image, write_image
from .ops.annotations import combine_segmentations, set_annotation_meta
from .ops.geometry import reduce_dimensions, reorient, restore_dimension
from .ops.projection import project
from .ops.visual import create_visual
from .utils.config import get_label_colors, get_shared_urls
from .utils.files import mkdirs
from .utils.logging import log, warn
from .utils.params import as_list, as_set, unwrap_singular


class TS2D:
    """Segment anatomical structures in CT scans (via coronal projection) or
    native 2D X-rays using an ensemble of 2D multilabel U-Net models.

    :param key: model key, resolved through the alias map + registry
        (default 'ts2d' -> ts2d-v2-ep4000b2, all five groups)
    :param use_remote: allow downloading models from the remote registry
    :param fetch_remote: refresh the registry from the upstream repo first
    :param local: override the local model database root (testing/offline)
    :param param: extra dot-key parameters merged into every model config
    :param batching: coalesce concurrent/in-flight predictions into
        micro-batched device programs (inference/batching.py) — the
        throughput mode for serving and directory inputs. The batched
        program's conv scheduling differs from the single-scan program's,
        which flips borderline sigmoid pixels (~0.06% of voxels measured),
        so results can depend on load; pass False for bitwise run-to-run
        consistency at lower throughput.
    :param pad_quantum: quantized-shape serving — each scan's cropped
        projection rides a shape BUCKET (next multiple of N per axis), and
        one geometry-as-data program per bucket serves every size inside
        it: the scan's true extent is data, driving traced nnU-Net tile
        layout, symmetric padding, and per-scan resample matrices built on
        device. Bounds the compiled-program count under heterogeneous
        traffic (exact mode compiles per cropped shape, minutes each on
        remote TPUs) and lets different-size scans coalesce into shared
        micro-batches. Results match the exact programs up to float-noise
        borderline flips (>=99.9% voxel agreement measured on synthetic
        all-borderline weights, tests/test_008). None (default) = exact
        per-shape programs.
    """

    def __init__(self, key: str = 'ts2d', use_remote: bool = True,
                 fetch_remote: bool = True,
                 local: Optional[str] = None,
                 param: Optional[dict] = None,
                 batching: bool = True,
                 pad_quantum: Optional[int] = None):
        self._batching = bool(batching)
        self._pad_quantum = pad_quantum
        colors = get_label_colors()
        model_param = {'nnu.result.colors': colors}
        if param:
            model_param.update(param)

        remote = URLDataBase(get_shared_urls(fetch_remote)) if use_remote else False
        self.zoo = Zoo(remote=remote, local=local)
        self.models: Dict[str, HostedModel] = {}
        # set BEFORE any model loading: a constructor failure mid-load
        # still reaches __del__ -> close(), which dereferences _fused
        self._fused = None

        ids = self.zoo.resolve(key, unique_model=True)
        if not ids:
            raise RuntimeError(f'No models were resolved for key: {key}')
        if len(ids) > 1:
            log(f"The model key '{key}' was resolved to {len(ids)} models: "
                f"{', '.join(ids)}.")
        for id_ in ids:
            try:
                model = self.zoo.load(id_, param=model_param)
                if not model.multilabel:
                    warn(f'The loaded model {id_} is not configured for '
                         f'multilabel inference - this should not be the case '
                         f'in TS2D and may lead to unexpected results.')
                self.models[id_] = model
            except Exception:
                traceback.print_exc()
                raise RuntimeError(
                    f'Failed to load model {id_}'
                    + (f' (resolved from {key})' if key != id_ else ''))

        # fast path: homogeneous model sets (including single-group tsxr
        # models) fuse into ONE device program (all groups + folds stacked),
        # gaining bit-packed downloads and micro-batched dispatch;
        # heterogeneous sets fall back to per-model engines, matching the
        # reference's sequential loop
        self._fused = self._build_fused()
        if self._fused is None:
            if self._pad_quantum is not None:
                warn('pad_quantum requires the fused ensemble engine; '
                     'the per-model fallback compiles per exact shape')
            for model in self.models.values():
                model.start(wait=False)
            for model in self.models.values():
                model.await_startup()

    def _build_fused(self):
        from .inference.ensemble_engine import EnsembleEngine
        models = list(self.models.values())
        try:
            for m in models:
                m.load_fold_params()  # also refines spec with mirror axes
            specs = [m.spec for m in models]
            ref = models[0]
            if not all(m.spec.multilabel for m in models):
                return None
            if any(m.channels != ref.channels for m in models):
                return None
            # the fused engine compiles ONE program from the first model's
            # settings — require the whole ensemble to agree on them, else
            # per-model nnu.predict.* overrides / checkpoint mirror axes of
            # the other groups would be silently ignored
            for m in models[1:]:
                if (m.tile_step_size != ref.tile_step_size
                        or m.use_mirroring != ref.use_mirroring
                        or m.compute_dtype() != ref.compute_dtype()
                        or m.spec.allowed_mirroring_axes
                        != ref.spec.allowed_mirroring_axes):
                    log('Fused ensemble unavailable (models disagree on '
                        'predict settings); using per-model engines.')
                    return None
            engine = EnsembleEngine(
                specs, [m.load_fold_params() for m in models],
                tile_step_size=(ref.tile_step_size
                                if ref.tile_step_size is not None else 0.5),
                use_mirroring=ref.use_mirroring,
                compute_dtype=ref.compute_dtype(),
                # concurrent requests (serve.py threads) coalesce into one
                # batched device dispatch; sequential callers are unaffected
                # (a lone request reuses the single-scan program)
                auto_batch=8 if self._batching else None,
                pad_quantum=self._pad_quantum)
            return engine
        except Exception as ex:
            log(f'Fused ensemble unavailable ({ex}); using per-model engines.')
            return None

    # -- lifecycle ---------------------------------------------------------

    def __enter__(self) -> 'TS2D':
        return self

    def __exit__(self, exc_type, exc_val, exc_tb) -> None:
        self.close()

    def close(self) -> None:
        for model in self.models.values():
            model.stop()
        self.models = {}
        if self._fused is not None:
            self._fused.close()
        self._fused = None

    def __del__(self):
        if getattr(self, 'models', None):
            warn('The TS2D instance is being deleted without calling close() '
                 '- cleaning up all models. Call close() explicitly before '
                 'deleting the instance to avoid concurrency issues.')
            try:
                self.close()
            except Exception:
                traceback.print_exc()

    # -- prediction -------------------------------------------------------

    def predict(self, input: Union[MedicalImage, str], collapse: bool = False,
                merge: bool = True) -> 'TS2D.Result':
        """Predict the segmentation for an image (path or MedicalImage).

        :param collapse: collapse outputs to true 2D, discarding the 3D
            size-1-axis geometry
        :param merge: merge the per-group segmentations into one multilabel
            image (117 channels for ts2d-v2)
        """
        if isinstance(input, str):
            input = read_image(input)
        if not isinstance(input, MedicalImage):
            raise RuntimeError(
                f'input must be a string path or a MedicalImage, found: '
                f'{type(input).__name__}')

        if self._fused is not None:
            return self._predict_fused(input, collapse=collapse, merge=merge)

        result: dict = {}
        cache: dict = {}
        for id_, model in self.models.items():
            res = self._predict_model(id_, input=input, collapse=collapse,
                                      cache=cache)
            result.setdefault('models', {})[id_] = res

        if merge:
            segs = {id_: r['segmentation']
                    for id_, r in result['models'].items()}
            if len(segs) == 1:
                result['segmentation'] = unwrap_singular(list(segs.values()))
            else:
                result['segmentation'] = combine_segmentations(list(segs.values()))

        result['input'] = input
        projections = cache.get('projections')
        if projections:
            result['projections'] = projections
        return TS2D.Result(result)

    @property
    def supports_async(self) -> bool:
        """True when predict_async actually dispatches without blocking
        (fused model set); False when it degrades to a completed blocking
        predict. Pipelines use this to size their in-flight window."""
        return self._fused is not None

    def predict_async(self, input: Union[MedicalImage, str],
                      collapse: bool = False, merge: bool = True):
        """Dispatch a prediction without blocking; returns a handle for
        :meth:`finish_predict`. Keeping several scans in flight lets the
        fused engine's micro-batcher coalesce them into one device program
        (the pipelined/serving throughput mode; ScanPipeline uses this for
        directory inputs). Falls back to a blocking predict for non-fused
        model sets (heterogeneous ensembles / single models)."""
        if isinstance(input, str):
            input = read_image(input)
        if not isinstance(input, MedicalImage):
            raise RuntimeError(
                f'input must be a string path or a MedicalImage, found: '
                f'{type(input).__name__}')
        if self._fused is None:
            return ('sync', self.predict(input, collapse=collapse,
                                         merge=merge))
        return ('fused',
                self._predict_fused_dispatch(input, collapse, merge))

    def finish_predict(self, handle) -> 'TS2D.Result':
        """Block on a :meth:`predict_async` handle and return the Result."""
        kind, data = handle
        if kind == 'sync':
            return data
        return self._predict_fused_finish(data)

    def _predict_model(self, id_: str, input: MedicalImage, collapse: bool,
                       cache: dict) -> dict:
        model = self.models.get(id_)
        assert isinstance(model, HostedModel), f'Model {id_!r} is not available.'

        result = {'id': id_}
        result['model'], result['group'] = decompose_model_key(id_)
        result['revision'] = model.revision

        channels = model.channels
        if not channels:
            raise RuntimeError(f'Model {id_} does not have a channel '
                               f'definition, cannot project the input image.')
        channels = sorted(channels.items(), key=lambda kv: kv[0])

        projections = cache.setdefault('projections', {})
        if input.actual_dimension() > 2:
            # 3D input: reorient and project each requested channel
            input = reorient(input, 'RAI')
            ch_list = []
            for _, ch_name in channels:
                if ch_name not in projections:
                    projections[ch_name] = self._project(input, mode=ch_name)
                ch_list.append(projections[ch_name])
            input = MedicalImage.compose(ch_list) if len(ch_list) > 1 \
                else unwrap_singular(ch_list)
        else:
            model_nch = len(channels)
            input_nch = input.ncomponents
            if model_nch != input_nch:
                raise RuntimeError(
                    f'The number of channels in the input image does not '
                    f'match the models channel definition '
                    f'({model_nch} vs {input_nch}).')
            projections.update((f'ch{i}', ch) for i, ch in
                               enumerate(input.split_channels()))

        native_2d = input.dim < 3
        input2d = input if native_2d else reduce_dimensions(input)
        seg = model.apply(input2d)
        seg = seg if (collapse or native_2d) else restore_dimension(seg, input)
        input = input2d if collapse else input

        result['input'] = input
        result['segmentation'] = seg
        return result

    @staticmethod
    def _project(img: MedicalImage, mode: str) -> MedicalImage:
        res = project(img, mode=mode, axis='coronal')
        return res.astype(np.float32)

    # -- fused ensemble path -------------------------------------------------

    @staticmethod
    def _model_colors(model: HostedModel) -> dict:
        palette = model.get_colors()
        colors = {}
        for _, name in model.labels.items():
            c = palette.get(name) or palette.get(str(name).lower())
            if c is not None:
                colors[name] = c
        return colors

    def _predict_fused(self, original: MedicalImage, collapse: bool,
                       merge: bool) -> 'TS2D.Result':
        """Fused-ensemble case path: host-side projection (3D inputs; one
        memory-bound numpy pass — far cheaper than uploading the volume to a
        remote-attached device), then ONE device program running all group
        models + the multilabel merge on the cropped 2D image. Per-model
        results are channel slices of the merged output. This is the exact
        reference dataflow (project on host -> 2D nnU-Net with
        crop_to_nonzero, tool.py:151-172)."""
        return self._predict_fused_finish(
            self._predict_fused_dispatch(original, collapse, merge))

    def _predict_fused_dispatch(self, original: MedicalImage, collapse: bool,
                                merge: bool):
        """Host half of the fused path: projection + non-blocking device
        dispatch. Returns a context for :meth:`_predict_fused_finish`.
        Splitting the two lets callers keep several scans in flight — the
        engine's micro-batcher then coalesces them into one device program
        (inference/batching.py)."""
        models = list(self.models.items())
        ref = models[0][1]
        channels = sorted(ref.channels.items(), key=lambda kv: kv[0])
        if not channels:
            raise RuntimeError(
                f'Model {models[0][0]} does not have a channel definition, '
                f'cannot project the input image.')

        projections: dict = {}
        if original.actual_dimension() > 2:
            from .ops.projection import project_multi
            oriented = reorient(original, 'RAI')
            # all channels in one fused host pass over the volume (native
            # max+mean kernel when available; per-mode numpy otherwise)
            ch_list = project_multi(oriented, [n for _, n in channels],
                                    axis='coronal')
            projections.update(
                (name, pimg) for (_, name), pimg in zip(channels, ch_list))
            model_input = MedicalImage.compose(ch_list) if len(ch_list) > 1 \
                else ch_list[0]
        else:
            if len(channels) != original.ncomponents:
                raise RuntimeError(
                    f'The number of channels in the input image does not '
                    f'match the models channel definition '
                    f'({len(channels)} vs {original.ncomponents}).')
            projections.update((f'ch{i}', ch) for i, ch in
                               enumerate(original.split_channels()))
            model_input = original
        input2d_tmp = model_input if model_input.dim < 3 \
            else reduce_dimensions(model_input)
        arr = input2d_tmp.array
        if not input2d_tmp.is_vector:
            arr = arr[..., None]
        spacing_yx = tuple(reversed(input2d_tmp.spacing))
        handle = self._fused.predict_array_async(
            np.ascontiguousarray(arr, np.float32), spacing_yx)
        return (handle, original, model_input, input2d_tmp, projections,
                collapse, merge)

    def _predict_fused_finish(self, ctx) -> 'TS2D.Result':
        """Device half of the fused path: block on the dispatch handle and
        assemble the Result (per-model channel slices + merged image)."""
        (handle, original, model_input, input2d_tmp, projections,
         collapse, merge) = ctx
        models = list(self.models.items())
        merged2d = self._fused.finish_array(handle)

        native_2d = model_input.dim < 3
        input2d = model_input if native_2d else reduce_dimensions(model_input)
        per_model_input = input2d if collapse else model_input

        result: dict = {'models': {}}
        offset = 0
        merged_names: dict = {}
        merged_colors: dict = {}
        for id_, model in models:
            n = model.spec.arch.out_channels - (0 if model.multilabel else 1)
            seg_arr = np.ascontiguousarray(merged2d[..., offset:offset + n])
            seg = input2d.replace(array=seg_arr, is_vector=True, meta={})
            colors = self._model_colors(model)
            set_annotation_meta(seg, names=model.labels, colors=colors)
            if not (collapse or native_2d):
                seg = restore_dimension(seg, model_input)
            mname, mgroup = decompose_model_key(id_)[:2]
            result['models'][id_] = {
                'id': id_,
                'model': mname,
                'group': mgroup,
                'revision': model.revision,
                'input': per_model_input,
                'segmentation': seg,
            }
            for lv, name in sorted(model.labels.items()):
                offset_label = len(merged_names) + 1
                merged_names[offset_label] = name
                if name in colors:
                    merged_colors[name] = colors[name]
            offset += n

        if merge:
            seg_all = input2d.replace(array=merged2d, is_vector=True, meta={})
            set_annotation_meta(seg_all, names=merged_names,
                                colors=merged_colors)
            if not (collapse or native_2d):
                seg_all = restore_dimension(seg_all, model_input)
            result['segmentation'] = seg_all

        result['input'] = original
        if projections:
            result['projections'] = projections
        return TS2D.Result(result)

    # -- results ------------------------------------------------------------

    class Result:
        def __init__(self, data: dict):
            self.data = data

        @property
        def models(self) -> List[str]:
            return sorted(self.data.get('models', {}).keys())

        def get_input(self, model: Optional[str] = None):
            if model is not None:
                return self.data.get('models', {}).get(model, {}).get('input')
            return self.data.get('input')

        def get_segmentation(self, model: Optional[str] = None):
            if model is not None:
                return self.data.get('models', {}).get(model, {}).get('segmentation')
            return self.data.get('segmentation')

        def get_projection(self, channel: Optional[str] = None):
            projections = self.data.get('projections', {})
            if channel is not None:
                return projections.get(channel)
            return projections

        def get_statistics(self, model: Optional[str] = None) -> dict:
            """Per-label statistics of a segmentation: {name: {value,
            exists, count, mm, color}} — voxel counts and physical area
            (mm^2 for 2D) like the reference's annotation labels with
            counts=True (meta.py:299-344)."""
            from .ops.annotations import get_annotation_labels
            seg = self.get_segmentation(model)
            if seg is None:
                return {}
            return get_annotation_labels(seg, counts=True)

        def save(self, dest: str, name: str = 'result', ext: str = 'nrrd',
                 models: Union[str, List[str]] = 'final',
                 targets: Union[str, List[str]] = 'all',
                 content: str = 'all',
                 naming: str = 'group') -> None:
            """Export results. File naming matrix matches the reference
            (tool.py:235-311): `<name>[-<group>][.seg].<ext>`, projections
            `<name>_<channel>.<ext>`, PNG visuals as siblings.

            :param models: 'final', 'all', or explicit model ids
            :param targets: subset of {'input','segmentation','projection'} or 'all'
            :param content: 'file', 'visual' or 'all'
            :param naming: 'group' (default) or 'model'
            """
            assert ext.lower() != 'png', \
                "PNG is not a valid export format for the 'file' content type."
            assert naming in ('group', 'model'), \
                f"Invalid naming scheme '{naming}', must be 'group' or 'model'."
            assert content in ('file', 'visual', 'all'), \
                f"Invalid export type '{content}'."
            contents = {'visual', 'file'} if content == 'all' else {content}

            model_set = as_set(str(t).strip().lower() for t in as_list(models))
            if 'all' in model_set:
                model_set |= set(self.models) | {None}
            if 'final' in model_set:
                model_set |= {None}
            model_set -= {'all', 'final'}
            target_set = as_set(str(t).strip().lower() for t in as_list(targets))

            def _filename(base, key):
                if key is not None and naming == 'group':
                    _, group = decompose_model_key(key)
                    return f'{base}-{group}'
                return base if key is None else f'{base}-{key}'

            def _export(img: MedicalImage, base: str, suffix: str = '',
                        labels=False):
                if 'file' in contents:
                    write_image(img, os.path.join(dest, f'{base}{suffix}.{ext}'))
                if 'visual' in contents:
                    if labels:
                        vis = create_visual(img, labels=labels, axis='coronal')
                        write_image(vis, os.path.join(dest, f'{base}{suffix}.png'))
                    else:
                        nch = img.ncomponents
                        for cidx, ch in enumerate(img.split_channels()):
                            vis = create_visual(ch, labels=False, axis='coronal')
                            fn = (f'{base}{suffix}.png' if nch == 1
                                  else f'{base}-ch{cidx}{suffix}.png')
                            write_image(vis, os.path.join(dest, fn))

            mkdirs(dest)

            if {'all', 'input'} & target_set:
                for key in model_set:
                    img = self.get_input(key)
                    if img is not None:
                        _export(img, _filename(name, key))

            if {'all', 'segmentation'} & target_set:
                for key in model_set:
                    img = self.get_segmentation(key)
                    if img is not None:
                        _export(img, _filename(name, key), suffix='.seg',
                                labels=True)

            if {'all', 'projection'} & target_set:
                for channel, img in self.get_projection().items():
                    base = f'{name}_{channel}'
                    if 'file' in contents:
                        write_image(img, os.path.join(dest, f'{base}.{ext}'))
                    if 'visual' in contents:
                        vis = create_visual(img)
                        write_image(vis, os.path.join(dest, f'{base}.png'))
