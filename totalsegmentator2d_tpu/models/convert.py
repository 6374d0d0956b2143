"""Torch checkpoint -> JAX pytree conversion.

The published TS2D weights are nnU-Net v2 ``checkpoint_final.pth`` files
(torch state dicts; layout discovered by the reference at wrapper.py:136-142
and loaded at nnu.py:149-166). This module converts them once, on the host,
into the nested-params layout of models/unet.py:

 - conv weights      OIHW -> HWIO
 - transpconv weights IOHW -> HWIO (verified against torch in tests)
 - InstanceNorm weight/bias -> norm.scale/bias

Key-name normalization tolerates the wrappers that show up in real
checkpoints: ``module.`` (DDP), ``_orig_mod.`` (torch.compile), duplicated
``all_modules.N`` aliases, and the decoder's back-reference to the encoder.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from ..utils.logging import warn
from .plans import ArchSpec

_STRIP_PREFIXES = ('module.', '_orig_mod.')


def load_torch_checkpoint(path: str, allow_pickle: bool = False) -> dict:
    """Load a torch checkpoint on CPU. Returns the raw checkpoint dict.

    Uses the safe ``weights_only`` unpickler: checkpoints arrive in zips
    downloaded from a network registry, and the permissive loader executes
    arbitrary pickle code. ``allow_pickle=True`` (or the environment opt-in
    ``TS2D_TRUST_CHECKPOINTS=1``) re-enables the legacy loader for trusted
    local files whose containers the safe unpickler rejects."""
    import os

    import torch
    try:
        return torch.load(path, map_location='cpu', weights_only=True)
    except Exception as ex:
        if allow_pickle or os.environ.get('TS2D_TRUST_CHECKPOINTS', '') == '1':
            return torch.load(path, map_location='cpu', weights_only=False)
        raise RuntimeError(
            f'Checkpoint {path!r} could not be loaded with the safe '
            f'weights-only unpickler ({ex}). If you trust this file, retry '
            f'with allow_pickle=True or set TS2D_TRUST_CHECKPOINTS=1.') from ex


def extract_state_dict(checkpoint: dict) -> Dict[str, np.ndarray]:
    sd = checkpoint.get('network_weights', checkpoint.get('state_dict', checkpoint))
    out = {}
    for k, v in sd.items():
        for p in _STRIP_PREFIXES:
            if k.startswith(p):
                k = k[len(p):]
        if k.startswith('decoder.encoder.'):
            continue  # decoder's back-reference duplicates encoder params
        if '.all_modules.' in k:
            continue  # duplicated aliases of conv/norm parameters
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, 'detach') else v)
    return out


_RE_ENC = re.compile(
    r'^encoder\.stages\.(\d+)(?:\.\d+)?\.convs\.(\d+)\.(conv|norm)\.(weight|bias)$')
_RE_DEC = re.compile(
    r'^decoder\.stages\.(\d+)(?:\.\d+)?\.convs\.(\d+)\.(conv|norm)\.(weight|bias)$')
_RE_TRANSP = re.compile(r'^decoder\.transpconvs\.(\d+)\.(weight|bias)$')
_RE_SEG = re.compile(r'^decoder\.seg_layers\.(\d+)\.(weight|bias)$')


def _conv_w(v: np.ndarray) -> np.ndarray:
    return np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO


def _transp_w(v: np.ndarray) -> np.ndarray:
    return np.transpose(v, (2, 3, 1, 0))  # IOHW -> HWOI (transpose_kernel=True)


def state_dict_to_params(sd: Dict[str, np.ndarray], spec: ArchSpec) -> dict:
    """Build the unet.py params pytree from a (normalized) torch state dict."""
    a = spec
    enc = [[{} for _ in range(a.n_conv_per_stage[s])] for s in range(a.n_stages)]
    n_dec = a.n_stages - 1
    dec = [[{} for _ in range(a.n_conv_per_stage_decoder[d])] for d in range(n_dec)]
    transp = [{} for _ in range(n_dec)]
    seg = [{} for _ in range(n_dec)]
    unused = []

    for k, v in sd.items():
        m = _RE_ENC.match(k)
        if m:
            s, c, part, wb = int(m[1]), int(m[2]), m[3], m[4]
            slot = enc[s][c].setdefault(part, {})
            if part == 'conv':
                slot['w' if wb == 'weight' else 'b'] = _conv_w(v) if wb == 'weight' else v
            else:
                slot['scale' if wb == 'weight' else 'bias'] = v
            continue
        m = _RE_DEC.match(k)
        if m:
            d, c, part, wb = int(m[1]), int(m[2]), m[3], m[4]
            slot = dec[d][c].setdefault(part, {})
            if part == 'conv':
                slot['w' if wb == 'weight' else 'b'] = _conv_w(v) if wb == 'weight' else v
            else:
                slot['scale' if wb == 'weight' else 'bias'] = v
            continue
        m = _RE_TRANSP.match(k)
        if m:
            d, wb = int(m[1]), m[2]
            transp[d]['w' if wb == 'weight' else 'b'] = \
                _transp_w(v) if wb == 'weight' else v
            continue
        m = _RE_SEG.match(k)
        if m:
            d, wb = int(m[1]), m[2]
            seg[d]['w' if wb == 'weight' else 'b'] = \
                _conv_w(v) if wb == 'weight' else v
            continue
        unused.append(k)

    if unused:
        warn(f'{len(unused)} checkpoint entries were not mapped '
             f'(first: {unused[:3]})')

    params = {'encoder': {'stages': enc},
              'decoder': {'transpconvs': transp, 'stages': dec,
                          'seg_layers': seg}}
    _validate(params, spec)
    return params


def _validate(params: dict, spec: ArchSpec) -> None:
    a = spec
    for s in range(a.n_stages):
        for c, block in enumerate(params['encoder']['stages'][s]):
            w = block.get('conv', {}).get('w')
            if w is None:
                raise ValueError(f'Missing encoder conv weight at stage {s} block {c}')
            expect_in = (a.in_channels if (s == 0 and c == 0) else
                         a.features_per_stage[s - 1] if c == 0 else
                         a.features_per_stage[s])
            if w.shape[2] != expect_in or w.shape[3] != a.features_per_stage[s]:
                raise ValueError(
                    f'Encoder stage {s} block {c}: conv weight {w.shape} does not '
                    f'match spec (in={expect_in}, out={a.features_per_stage[s]})')
    head = params['decoder']['seg_layers'][-1].get('w')
    if head is None:
        raise ValueError('Missing final segmentation head weights')
    if head.shape[3] != a.out_channels:
        raise ValueError(f'Segmentation head has {head.shape[3]} outputs, '
                         f'spec expects {a.out_channels}')


def params_to_state_dict(params: dict, spec: ArchSpec) -> Dict[str, np.ndarray]:
    """Inverse conversion (JAX pytree -> torch-style state dict), used for
    round-trip tests and exporting trained models back to the nnU-Net layout."""
    sd: Dict[str, np.ndarray] = {}

    def put_block(prefix: str, block: dict):
        conv = block.get('conv', {})
        if 'w' in conv:
            sd[prefix + '.conv.weight'] = np.transpose(conv['w'], (3, 2, 0, 1))
        if 'b' in conv:
            sd[prefix + '.conv.bias'] = np.asarray(conv['b'])
        norm = block.get('norm')
        if norm:
            if 'scale' in norm:
                sd[prefix + '.norm.weight'] = np.asarray(norm['scale'])
            if 'bias' in norm:
                sd[prefix + '.norm.bias'] = np.asarray(norm['bias'])

    for s, stage in enumerate(params['encoder']['stages']):
        for c, block in enumerate(stage):
            put_block(f'encoder.stages.{s}.convs.{c}', block)
    for d, t in enumerate(params['decoder']['transpconvs']):
        sd[f'decoder.transpconvs.{d}.weight'] = np.transpose(t['w'], (3, 2, 0, 1))
        if 'b' in t:
            sd[f'decoder.transpconvs.{d}.bias'] = np.asarray(t['b'])
    for d, stage in enumerate(params['decoder']['stages']):
        for c, block in enumerate(stage):
            put_block(f'decoder.stages.{d}.convs.{c}', block)
    for d, sl in enumerate(params['decoder']['seg_layers']):
        sd[f'decoder.seg_layers.{d}.weight'] = np.transpose(sl['w'], (3, 2, 0, 1))
        if 'b' in sl:
            sd[f'decoder.seg_layers.{d}.bias'] = np.asarray(sl['b'])
    return sd


def convert_checkpoint(path: str, spec: ArchSpec) -> Tuple[dict, dict]:
    """Load + convert a checkpoint file. Returns (params, checkpoint_meta)."""
    ckpt = load_torch_checkpoint(path)
    sd = extract_state_dict(ckpt)
    params = state_dict_to_params(sd, spec)
    meta = {k: v for k, v in ckpt.items()
            if k in ('inference_allowed_mirroring_axes', 'trainer_name',
                     'current_epoch', 'init_args')}
    return params, meta
