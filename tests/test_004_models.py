"""Model layer: plans parsing, JAX U-Net vs torch oracle, checkpoint conversion."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.torch_mirror import TorchPlainConvUNet, make_spec
from totalsegmentator2d_tpu.models import (forward, init_params,
                                           pad_to_stride, param_count,
                                           parse_model_spec)
from totalsegmentator2d_tpu.models.convert import (extract_state_dict,
                                                   params_to_state_dict,
                                                   state_dict_to_params)

PLANS = {
    'plans_name': 'nnUNetPlans',
    'configurations': {
        '2d': {
            'patch_size': [256, 224],
            'spacing': [1.5, 1.5],
            'normalization_schemes': ['CTNormalization', 'CTNormalization'],
            'use_mask_for_norm': [False, False],
            'architecture': {
                'network_class_name':
                    'dynamic_network_architectures.architectures.unet.PlainConvUNet',
                'arch_kwargs': {
                    'n_stages': 4,
                    'features_per_stage': [8, 16, 32, 32],
                    'conv_op': 'torch.nn.modules.conv.Conv2d',
                    'kernel_sizes': [[3, 3]] * 4,
                    'strides': [[1, 1], [2, 2], [2, 2], [2, 2]],
                    'n_conv_per_stage': [2, 2, 2, 2],
                    'n_conv_per_stage_decoder': [2, 2, 2],
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
    'foreground_intensity_properties_per_channel': {
        '0': {'mean': 100.0, 'std': 50.0, 'percentile_00_5': -100.0,
              'percentile_99_5': 1000.0},
        '1': {'mean': 40.0, 'std': 30.0, 'percentile_00_5': -200.0,
              'percentile_99_5': 500.0},
    },
}

DATASET = {
    'channel_names': {'0': 'max', '1': 'mean'},
    'labels': {'background': 0, 'heart': 1, 'aorta': 2, 'lung-left': 3,
               'lung-right': 4, 'trachea': 5},
    'numTraining': 10,
    'file_ending': '.nrrd',
    'multilabel': True,
}


class TestPlans:
    def test_parse_spec(self):
        spec = parse_model_spec(PLANS, DATASET)
        assert spec.arch.n_stages == 4
        assert spec.arch.in_channels == 2
        assert spec.arch.out_channels == 5  # multilabel: no background head
        assert spec.multilabel
        assert spec.preprocess.patch_size == (256, 224)
        assert spec.labels == {1: 'heart', 2: 'aorta', 3: 'lung-left',
                               4: 'lung-right', 5: 'trachea'}
        assert spec.channel_names == {0: 'max', 1: 'mean'}
        assert spec.arch.total_stride == (8, 8)

    def test_parse_not_multilabel(self):
        ds = dict(DATASET)
        ds.pop('multilabel')
        spec = parse_model_spec(PLANS, ds)
        assert not spec.multilabel
        assert spec.arch.out_channels == 6  # softmax incl. background

    def test_mirror_axes_from_checkpoint(self):
        spec = parse_model_spec(PLANS, DATASET,
                                checkpoint_meta={'inference_allowed_mirroring_axes': [0]})
        assert spec.allowed_mirroring_axes == (0,)

    def test_pad_to_stride(self):
        spec = parse_model_spec(PLANS, DATASET)
        assert pad_to_stride((100, 300), spec.arch.total_stride,
                             spec.preprocess.patch_size) == (256, 304)


@pytest.fixture(scope='module')
def torch_model_and_params():
    spec = make_spec(in_channels=2, out_channels=5, n_stages=4)
    torch.manual_seed(0)
    model = TorchPlainConvUNet(spec).eval()
    # randomize affine norm params so they are actually exercised
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.InstanceNorm2d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    params = state_dict_to_params(sd, spec)
    return spec, model, params


class TestUNetParity:
    def test_forward_matches_torch(self, torch_model_and_params, rng):
        spec, model, params = torch_model_and_params
        x = rng.standard_normal((2, 64, 48, 2)).astype(np.float32)
        with torch.no_grad():
            ref = model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
        out = np.asarray(forward(params, jnp.asarray(x), spec))
        assert out.shape == ref.shape == (2, 64, 48, 5)
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)

    def test_forward_jit_and_vmap(self, torch_model_and_params, rng):
        spec, _, params = torch_model_and_params
        x = rng.standard_normal((1, 32, 32, 2)).astype(np.float32)
        f = jax.jit(lambda p, v: forward(p, v, spec))
        single = np.asarray(f(params, jnp.asarray(x)))
        # stacked two-fold ensemble via vmap over the params pytree
        stacked = jax.tree_util.tree_map(lambda a: jnp.stack([a, a]), params)
        both = np.asarray(jax.vmap(f, in_axes=(0, None))(stacked, jnp.asarray(x)))
        assert both.shape == (2, 1, 32, 32, 5)
        np.testing.assert_allclose(both[0], single, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(both[1], single, rtol=1e-5, atol=1e-6)

    def test_deep_supervision_heads(self, torch_model_and_params, rng):
        spec, _, params = torch_model_and_params
        x = rng.standard_normal((1, 64, 64, 2)).astype(np.float32)
        outs = forward(params, jnp.asarray(x), spec, deep_supervision=True)
        assert len(outs) == spec.n_stages - 1
        assert outs[0].shape == (1, 64, 64, 5)      # full resolution first
        assert outs[1].shape == (1, 32, 32, 5)


class TestConverter:
    def test_state_dict_roundtrip(self, torch_model_and_params):
        spec, model, params = torch_model_and_params
        back = params_to_state_dict(params, spec)
        orig = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
        assert set(back) == set(orig)
        for k in orig:
            np.testing.assert_array_equal(back[k], orig[k])

    def test_checkpoint_file_conversion(self, torch_model_and_params, tmp_path):
        spec, model, _ = torch_model_and_params
        ckpt = {
            'network_weights': model.state_dict(),
            'trainer_name': 'nnUNetTrainer',
            'inference_allowed_mirroring_axes': [0, 1],
            'current_epoch': 4000,
        }
        p = tmp_path / 'checkpoint_final.pth'
        torch.save(ckpt, p)
        from totalsegmentator2d_tpu.models.convert import convert_checkpoint
        params, meta = convert_checkpoint(str(p), spec)
        assert meta['inference_allowed_mirroring_axes'] == [0, 1]
        assert param_count(params) == sum(v.numel() for v in model.state_dict().values())

    def test_ddp_and_alias_keys_tolerated(self, torch_model_and_params):
        spec, model, params = torch_model_and_params
        sd = {f'module.{k}': v.detach().cpu().numpy()
              for k, v in model.state_dict().items()}
        sd['encoder.stages.0.convs.0.all_modules.0.weight'] = \
            sd['module.encoder.stages.0.convs.0.conv.weight']

        class FakeTensor:
            def __init__(self, a):
                self._a = a
            def detach(self):
                return self
            def cpu(self):
                return self
            def numpy(self):
                return self._a

        raw = {'network_weights': {k: FakeTensor(v) for k, v in sd.items()}}
        cleaned = extract_state_dict(raw)
        params2 = state_dict_to_params(cleaned, spec)
        a = params['encoder']['stages'][0][0]['conv']['w']
        b = params2['encoder']['stages'][0][0]['conv']['w']
        np.testing.assert_array_equal(a, b)

    def test_shape_mismatch_rejected(self, torch_model_and_params):
        spec, model, _ = torch_model_and_params
        sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
        bad_spec = make_spec(in_channels=3, out_channels=5, n_stages=4)
        with pytest.raises(ValueError):
            state_dict_to_params(sd, bad_spec)

    def test_pickle_checkpoint_rejected_without_optin(self, tmp_path,
                                                      monkeypatch):
        """Checkpoints needing the permissive (code-executing) unpickler are
        rejected unless explicitly trusted — they arrive from the network."""
        from argparse import Namespace

        from totalsegmentator2d_tpu.models.convert import load_torch_checkpoint

        p = tmp_path / 'checkpoint_final.pth'
        # a picklable payload the weights-only unpickler rejects
        torch.save({'network_weights': {}, 'extra': Namespace(a=1)}, p)
        monkeypatch.delenv('TS2D_TRUST_CHECKPOINTS', raising=False)
        with pytest.raises(RuntimeError, match='weights-only'):
            load_torch_checkpoint(str(p))
        ckpt = load_torch_checkpoint(str(p), allow_pickle=True)
        assert 'network_weights' in ckpt
        monkeypatch.setenv('TS2D_TRUST_CHECKPOINTS', '1')
        assert 'network_weights' in load_torch_checkpoint(str(p))


class TestInit:
    @pytest.mark.slow
    def test_init_shapes_match_converter_layout(self, torch_model_and_params):
        spec, model, params = torch_model_and_params
        init = init_params(jax.random.PRNGKey(0), spec)
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
        new_shapes = jax.tree_util.tree_map(lambda a: a.shape, init)
        assert ref_shapes == new_shapes


class TestOnePassStats:
    """TS2D_STATS=1pass: the single-traversal InstanceNorm variance
    (E[x^2]-E[x]^2) must track the default two-pass statistics to float
    noise and never go negative."""

    def test_matches_two_pass(self, rng, monkeypatch):
        import jax.numpy as jnp
        from totalsegmentator2d_tpu.models import unet
        x = jnp.asarray(rng.normal(2.0, 1.5, (3, 32, 32, 8)), jnp.float32)
        scale = jnp.asarray(rng.normal(1.0, 0.1, (8,)), jnp.float32)
        bias = jnp.asarray(rng.normal(0.0, 0.1, (8,)), jnp.float32)
        monkeypatch.delenv('TS2D_STATS', raising=False)
        y2 = unet._instance_norm(x, scale, bias, 1e-5)
        monkeypatch.setenv('TS2D_STATS', '1pass')
        y1 = unet._instance_norm(x, scale, bias, 1e-5)
        assert float(jnp.max(jnp.abs(y1 - y2))) < 1e-4

    def test_variance_clamped_nonnegative(self, monkeypatch):
        import jax.numpy as jnp
        from totalsegmentator2d_tpu.models import unet
        monkeypatch.setenv('TS2D_STATS', '1pass')
        # constant input: E[x^2]-E[x]^2 cancels to ~0 and can go slightly
        # negative in float; rsqrt must stay finite
        x = jnp.full((1, 16, 16, 4), 3.14159, jnp.float32)
        y = unet._instance_norm(x, None, None, 1e-5)
        assert bool(jnp.isfinite(y).all())
