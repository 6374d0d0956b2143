"""Synthetic offline model database for tests.

Builds real nnU-Net-layout model directories (model.json +
Dataset###/<trainer>__<plans>__<config>/{dataset.json, plans.json,
fold_N/checkpoint_final.pth}) with small random torch checkpoints, so the
zoo/engine/API stack runs end-to-end without network access — the offline
fixture SURVEY.md §4 calls for.
"""

import json
import os

import numpy as np
import torch

from tests.torch_mirror import TorchPlainConvUNet, make_spec


def make_plans(patch=(64, 64), spacing=(1.5, 1.5), channels=('max', 'mean'),
               n_stages=4, features=(8, 16, 32, 32)):
    n_ch = len(channels)
    return {
        'dataset_name': 'Dataset101_synth',
        'plans_name': 'nnUNetPlans',
        'configurations': {
            '2d': {
                'data_identifier': 'nnUNetPlans_2d',
                'batch_size': 2,
                'patch_size': list(patch),
                'spacing': list(spacing),
                'normalization_schemes': ['ZScoreNormalization'] * n_ch,
                'use_mask_for_norm': [False] * n_ch,
                'architecture': {
                    'network_class_name':
                        'dynamic_network_architectures.architectures.unet.PlainConvUNet',
                    'arch_kwargs': {
                        'n_stages': n_stages,
                        'features_per_stage': list(features[:n_stages]),
                        'conv_op': 'torch.nn.modules.conv.Conv2d',
                        'kernel_sizes': [[3, 3]] * n_stages,
                        'strides': [[1, 1]] + [[2, 2]] * (n_stages - 1),
                        'n_conv_per_stage': [2] * n_stages,
                        'n_conv_per_stage_decoder': [2] * (n_stages - 1),
                        'conv_bias': True,
                        'norm_op': 'torch.nn.modules.instancenorm.InstanceNorm2d',
                        'norm_op_kwargs': {'eps': 1e-05, 'affine': True},
                        'dropout_op': None,
                        'nonlin': 'torch.nn.LeakyReLU',
                        'nonlin_kwargs': {'inplace': True},
                    },
                },
            }
        },
        'foreground_intensity_properties_per_channel': {},
    }


def make_dataset_json(labels, channels=('max', 'mean'), multilabel=True):
    return {
        'channel_names': {str(i): c for i, c in enumerate(channels)},
        'labels': {'background': 0, **{n: i + 1 for i, n in enumerate(labels)}},
        'numTraining': 8,
        'file_ending': '.nrrd',
        'multilabel': multilabel,
    }


def build_model_dir(root, model='ts2d-v9-test', group='cardiac', revision=1,
                    labels=('heart', 'aorta', 'pulmonary-artery'),
                    channels=('max', 'mean'), patch=(64, 64),
                    spacing=(1.5, 1.5), folds=(0,), seed=0,
                    configuration='2d', task_id=101, multilabel=True):
    """Create <root>/<model>_<group>/r00N/ with the full nnU-Net tree.
    Returns the model id."""
    mid = f'{model}_{group}'
    base = os.path.join(root, mid, f'r{revision:03d}')
    task_name = f'Dataset{task_id}_synth{group}'
    trainer_dir = f'nnUNetTrainer__nnUNetPlans__{configuration}'
    data_dir = os.path.join(base, task_name, trainer_dir)
    os.makedirs(data_dir, exist_ok=True)

    with open(os.path.join(base, 'model.json'), 'w') as f:
        json.dump({'param': {'nnu': {'configuration': configuration,
                                     'folds': list(folds)}}}, f)

    plans = make_plans(patch=patch, spacing=spacing, channels=channels)
    plans['configurations'][configuration] = plans['configurations'].pop('2d') \
        if configuration != '2d' else plans['configurations']['2d']
    ds = make_dataset_json(labels, channels=channels, multilabel=multilabel)
    with open(os.path.join(data_dir, 'plans.json'), 'w') as f:
        json.dump(plans, f)
    with open(os.path.join(data_dir, 'dataset.json'), 'w') as f:
        json.dump(ds, f)

    out_ch = len(labels) if multilabel else len(labels) + 1
    spec = make_spec(in_channels=len(channels), out_channels=out_ch, n_stages=4)
    torch.manual_seed(seed)
    net = TorchPlainConvUNet(spec)
    for fold in folds:
        fd = os.path.join(data_dir, f'fold_{fold}')
        os.makedirs(fd, exist_ok=True)
        torch.save({
            'network_weights': net.state_dict(),
            'trainer_name': 'nnUNetTrainer',
            'inference_allowed_mirroring_axes': [0, 1],
            'current_epoch': 10,
        }, os.path.join(fd, 'checkpoint_final.pth'))
    return mid


def build_group_set(root, model='ts2d-v9-test', groups=('cardiac', 'ribs'),
                    labels_per_group=None, **kw):
    """Several groups of one base model (a miniature ts2d ensemble)."""
    labels_per_group = labels_per_group or {
        'cardiac': ('heart', 'aorta'),
        'ribs': ('rib-left-1', 'rib-right-1', 'rib-left-2'),
    }
    ids = []
    for i, g in enumerate(groups):
        ids.append(build_model_dir(root, model=model, group=g,
                                   labels=labels_per_group[g], seed=i,
                                   task_id=101 + i, **kw))
    return ids
